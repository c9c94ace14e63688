"""Roberta text encoder (flax) — the frozen neighbor-text tower.

Counterpart of the reference's `RobertaModel.from_pretrained` usage
(modelling_self_attention.py:111, modelling_cross_attention.py:921). Only the
encoder trunk is here; the first-token TextPooler + projection live in the
fusion wrappers (models/fusion.py), matching the reference's split.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmgl_tpu.ops import multi_head_attention


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    hidden_act: str = "gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


class RobertaEmbeddings(nn.Module):
    config: RobertaConfig

    def setup(self):
        cfg = self.config
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype)
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size, dtype=cfg.dtype,
                                            param_dtype=cfg.param_dtype)
        self.token_type_embeddings = nn.Embed(cfg.type_vocab_size,
                                              cfg.hidden_size, dtype=cfg.dtype,
                                              param_dtype=cfg.param_dtype)
        self.layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype)

    def __call__(self, input_ids, attention_mask):
        cfg = self.config
        # roberta positions: cumsum of non-pad mask offset by padding_idx
        mask = attention_mask.astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(positions)
             + self.token_type_embeddings(jnp.zeros_like(input_ids)))
        return self.layer_norm(x)


class RobertaSelfAttention(nn.Module):
    config: RobertaConfig

    def setup(self):
        cfg = self.config
        dense = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.query = nn.Dense(cfg.hidden_size, **dense)
        self.key = nn.Dense(cfg.hidden_size, **dense)
        self.value = nn.Dense(cfg.hidden_size, **dense)
        self.out = nn.Dense(cfg.hidden_size, **dense)

    def __call__(self, hidden_states, attention_mask):
        cfg = self.config
        b, s, _ = hidden_states.shape
        h, d = cfg.num_attention_heads, cfg.head_dim
        q = self.query(hidden_states).reshape(b, s, h, d)
        k = self.key(hidden_states).reshape(b, s, h, d)
        v = self.value(hidden_states).reshape(b, s, h, d)
        out = multi_head_attention(q, k, v, kv_mask=attention_mask,
                                   use_pallas=cfg.use_pallas)
        return self.out(out.reshape(b, s, cfg.hidden_size))


class RobertaLayer(nn.Module):
    config: RobertaConfig

    def setup(self):
        cfg = self.config
        self.attention = RobertaSelfAttention(cfg)
        self.attention_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                           dtype=cfg.dtype,
                                           param_dtype=cfg.param_dtype)
        dense = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        self.intermediate = nn.Dense(cfg.intermediate_size, **dense)
        self.output = nn.Dense(cfg.hidden_size, **dense)
        self.output_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype)

    def __call__(self, hidden_states, attention_mask):
        attn = self.attention(hidden_states, attention_mask)
        hidden_states = self.attention_norm(hidden_states + attn)
        inter = jax.nn.gelu(self.intermediate(hidden_states), approximate=False)
        return self.output_norm(hidden_states + self.output(inter))


class RobertaEncoder(nn.Module):
    config: RobertaConfig

    def setup(self):
        self.layers = [RobertaLayer(self.config, name=f"layers_{i}")
                       for i in range(self.config.num_hidden_layers)]

    def __call__(self, hidden_states, attention_mask):
        for layer in self.layers:
            hidden_states = layer(hidden_states, attention_mask)
        return hidden_states


class RobertaModel(nn.Module):
    """Returns last_hidden_state (B, S, H)."""

    config: RobertaConfig

    def setup(self):
        self.embeddings = RobertaEmbeddings(self.config)
        self.encoder = RobertaEncoder(self.config)

    def __call__(self, input_ids, attention_mask=None):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = self.embeddings(input_ids, attention_mask)
        return self.encoder(x, attention_mask)
