"""OPT decoder-only LM (flax), TPU-native.

Re-implements the behavior of the reference's OPT usage — both the stock HF
model behind SelfAttentionModel (modelling_self_attention.py:69-72) and the
from-scratch MPT decoder (modelling_cross_attention.py:400-876) — as one
configurable flax model:

  * learned positions from attention-mask cumsum with offset 2
    (MPTLearnedPositionalEmbedding, modelling_cross_attention.py:124-145)
  * pre-LN (125m/1.3b/2.7b) and post-LN (350m) orderings, word-embed
    projection for 350m (modelling_cross_attention.py:413-421)
  * optional interleaved gated cross-attention layers over neighbor memory
    (MPTDecoder:437-442,613-625) with flamingo tanh gates init 0 (:298-302)
  * working KV-cache decode (the reference's cache is vestigial — SURVEY Q5)
  * LoRA adapters on q/v projections, prefix/prompt virtual tokens
    (JAX-native PEFT, see peft/)

Attention runs through ops.multi_head_attention (Pallas fused on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmgl_tpu.models.layers import ACT2FN, LoRADense, make_positions_from_mask
from mmgl_tpu.ops import multi_head_attention
from mmgl_tpu.ops.dropout import FastDropout

Dtype = Any
Cache = Dict[str, jax.Array]


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 2048
    word_embed_proj_dim: Optional[int] = None  # != hidden_size only for 350m
    do_layer_norm_before: bool = True
    remove_final_layer_norm: bool = False
    activation_function: str = "relu"
    dropout: float = 0.1
    attention_dropout: float = 0.0
    layerdrop: float = 0.0      # per-layer skip prob at train time
                                # (modelling_cross_attention.py:581-584)
    init_std: float = 0.02
    enable_bias: bool = True
    layer_norm_elementwise_affine: bool = True
    pad_token_id: int = 1
    bos_token_id: int = 2
    eos_token_id: int = 2
    tie_word_embeddings: bool = True
    # --- MMGL extensions (MPT path) ---
    cross_attention: bool = False           # insert neighbor cross-attn layers
    neighbor_layer_wise: int = 4            # every k-th layer gets one
    peft_type: str = "none"                 # none|lora|prefix|prompt|flamingo
    lora_r: int = 64
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    num_virtual_tokens: int = 20            # prefix/prompt tuning length
    # --- TPU-native ---
    dtype: Any = jnp.float32                # compute dtype
    param_dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_neighbor_layers(self) -> int:
        if not self.cross_attention:
            return 0
        return self.num_hidden_layers // self.neighbor_layer_wise


def init_cache(config: OPTConfig, batch: int, max_len: int) -> List[Cache]:
    """Empty per-layer KV cache for autoregressive decode."""
    h, d = config.num_attention_heads, config.head_dim
    return [
        {
            "k": jnp.zeros((batch, max_len, h, d), config.dtype),
            "v": jnp.zeros((batch, max_len, h, d), config.dtype),
            "index": jnp.zeros((), jnp.int32),
        }
        for _ in range(config.num_hidden_layers)
    ]


def _layer_norm(cfg: OPTConfig, name: str) -> nn.LayerNorm:
    # epsilon 1e-5 matches torch nn.LayerNorm (flax defaults to 1e-6)
    return nn.LayerNorm(epsilon=1e-5,
                        use_bias=cfg.layer_norm_elementwise_affine,
                        use_scale=cfg.layer_norm_elementwise_affine,
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)


class OPTAttention(nn.Module):
    """Self- or cross-attention (K/V from neighbor memory when cross)."""

    config: OPTConfig
    cross_attention: bool = False
    causal: bool = True

    def setup(self):
        cfg = self.config
        lora = cfg.lora_r if cfg.peft_type == "lora" else 0
        dense = dict(use_bias=cfg.enable_bias, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)
        self.q_proj = LoRADense(cfg.hidden_size, lora_rank=lora,
                                lora_alpha=cfg.lora_alpha,
                                lora_dropout=cfg.lora_dropout, **dense)
        self.v_proj = LoRADense(cfg.hidden_size, lora_rank=lora,
                                lora_alpha=cfg.lora_alpha,
                                lora_dropout=cfg.lora_dropout, **dense)
        self.k_proj = nn.Dense(cfg.hidden_size, **dense)
        self.out_proj = nn.Dense(cfg.hidden_size, **dense)

    def __call__(
        self,
        hidden_states: jax.Array,                       # (B, S, E)
        kv_states: Optional[jax.Array] = None,          # (B, Sk, E) for cross
        kv_mask: Optional[jax.Array] = None,            # (B, Sk)
        cache: Optional[Cache] = None,
        prefix_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[Cache]]:
        cfg = self.config
        h, d = cfg.num_attention_heads, cfg.head_dim
        b, s, _ = hidden_states.shape

        def heads(x):
            return x.reshape(b, -1, h, d)

        q = heads(self.q_proj(hidden_states, deterministic))
        src = kv_states if self.cross_attention else hidden_states
        k = heads(self.k_proj(src))
        v = heads(self.v_proj(src, deterministic))

        causal = self.causal and not self.cross_attention
        new_cache = None
        if cache is not None and not self.cross_attention:
            # write current K/V at cache["index"]
            idx = cache["index"]
            merged_k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0))
            merged_v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0))
            new_cache = {"k": merged_k, "v": merged_v, "index": idx + s}
            if s == 1:
                # decode step: attend over the written cache prefix
                k, v = merged_k, merged_v
                max_len = k.shape[1]
                valid = jnp.arange(max_len)[None, :] < (idx + s)
                if kv_mask is not None and kv_mask.shape[1] < max_len:
                    pad = jnp.ones((b, max_len - kv_mask.shape[1]), kv_mask.dtype)
                    kv_mask = jnp.concatenate([kv_mask, pad], axis=1)
                kv_mask = (valid if kv_mask is None
                           else kv_mask.astype(bool) & valid)
                causal = False
            # else: prefill — attend causally over the current segment only
            # (exact when the cache is empty, the only prefill pattern)

        if prefix_kv is not None and not self.cross_attention:
            pk, pv = prefix_kv  # (P, H, D) learned, broadcast over batch
            pk = jnp.broadcast_to(pk[None], (b,) + pk.shape).astype(k.dtype)
            pv = jnp.broadcast_to(pv[None], (b,) + pv.shape).astype(v.dtype)
            k = jnp.concatenate([pk, k], axis=1)
            v = jnp.concatenate([pv, v], axis=1)
            if kv_mask is not None:
                ones = jnp.ones((b, pk.shape[1]), kv_mask.dtype)
                kv_mask = jnp.concatenate([ones, kv_mask], axis=1)

        dropout_rng = None
        rate = 0.0 if deterministic else cfg.attention_dropout
        if rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        out = multi_head_attention(
            q, k, v, kv_mask=kv_mask, causal=causal, dropout_rate=rate,
            dropout_rng=dropout_rng, use_pallas=cfg.use_pallas,
        )
        out = out.reshape(b, s, cfg.hidden_size)
        return self.out_proj(out), new_cache


class OPTDecoderLayer(nn.Module):
    """Pre/post-LN OPT block; tanh-gated residuals on flamingo cross layers
    (modelling_cross_attention.py:298-302,334-337,358-361)."""

    config: OPTConfig
    cross_attention: bool = False

    def setup(self):
        cfg = self.config
        self.self_attn = OPTAttention(cfg, cross_attention=self.cross_attention)
        self.self_attn_layer_norm = _layer_norm(cfg, "self_attn_layer_norm")
        self.final_layer_norm = _layer_norm(cfg, "final_layer_norm")
        dense = dict(use_bias=cfg.enable_bias, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)
        self.fc1 = nn.Dense(cfg.ffn_dim, **dense)
        self.fc2 = nn.Dense(cfg.hidden_size, **dense)
        self.dropout = FastDropout(rate=cfg.dropout)
        if self.cross_attention and cfg.peft_type == "flamingo":
            self.gating1 = self.param("gating1", nn.initializers.zeros, ())
            self.gating2 = self.param("gating2", nn.initializers.zeros, ())

    def __call__(
        self,
        hidden_states: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        neighbor_embeds: Optional[jax.Array] = None,
        neighbor_mask: Optional[jax.Array] = None,
        cache: Optional[Cache] = None,
        prefix_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[Cache]]:
        cfg = self.config
        gated = self.cross_attention and cfg.peft_type == "flamingo"

        residual = hidden_states
        if cfg.do_layer_norm_before:
            hidden_states = self.self_attn_layer_norm(hidden_states)
        attn_out, new_cache = self.self_attn(
            hidden_states,
            kv_states=neighbor_embeds if self.cross_attention else None,
            kv_mask=neighbor_mask if self.cross_attention else attention_mask,
            cache=cache, prefix_kv=prefix_kv, deterministic=deterministic)
        attn_out = self.dropout(attn_out, deterministic=deterministic)
        if gated:
            hidden_states = residual + jnp.tanh(self.gating1).astype(cfg.dtype) * attn_out
        else:
            hidden_states = residual + attn_out
        if not cfg.do_layer_norm_before:
            hidden_states = self.self_attn_layer_norm(hidden_states)

        residual = hidden_states
        if cfg.do_layer_norm_before:
            hidden_states = self.final_layer_norm(hidden_states)
        hidden_states = self.fc1(hidden_states)
        hidden_states = ACT2FN[cfg.activation_function](hidden_states)
        hidden_states = self.fc2(hidden_states)
        hidden_states = self.dropout(hidden_states, deterministic=deterministic)
        if gated:
            hidden_states = residual + jnp.tanh(self.gating2).astype(cfg.dtype) * hidden_states
        else:
            hidden_states = residual + hidden_states
        if not cfg.do_layer_norm_before:
            hidden_states = self.final_layer_norm(hidden_states)
        return hidden_states, new_cache


class OPTDecoder(nn.Module):
    config: OPTConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                                     dtype=cfg.dtype,
                                     param_dtype=cfg.param_dtype)
        # learned positions, offset 2 (modelling_cross_attention.py:130-133)
        self.embed_positions = nn.Embed(cfg.max_position_embeddings + 2,
                                        cfg.hidden_size, dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype)
        if cfg.word_embed_proj_dim and cfg.word_embed_proj_dim != cfg.hidden_size:
            self.project_in = nn.Dense(cfg.hidden_size, use_bias=False,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype)
            self.project_out = nn.Dense(cfg.embed_dim, use_bias=False,
                                        dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype)
        else:
            self.project_in = self.project_out = None
        if cfg.do_layer_norm_before and not cfg.remove_final_layer_norm:
            self.final_layer_norm = _layer_norm(cfg, None)
        else:
            self.final_layer_norm = None
        self.embed_dropout = FastDropout(rate=cfg.dropout)

        layer_cls = OPTDecoderLayer
        if cfg.remat:
            # deterministic (positional arg 6 of __call__) must stay static
            layer_cls = nn.remat(OPTDecoderLayer, static_argnums=(7,))
        self.layers = [layer_cls(cfg, name=f"layers_{i}")
                       for i in range(cfg.num_hidden_layers)]
        if cfg.cross_attention:
            self.neighbor_layers = [
                layer_cls(cfg, cross_attention=True, name=f"neighbor_layers_{i}")
                for i in range(cfg.num_neighbor_layers)
            ]

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,          # (B, S)
        attention_mask: Optional[jax.Array] = None,     # (B, S_total)
        inputs_embeds: Optional[jax.Array] = None,      # (B, S, E)
        neighbor_embeds: Optional[jax.Array] = None,    # (B, Sn, hidden)
        neighbor_mask: Optional[jax.Array] = None,      # (B, Sn)
        caches: Optional[List[Cache]] = None,
        prefix_kvs: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
        position_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[List[Cache]]]:
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, s = inputs_embeds.shape[:2]

        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if position_ids is None:
            position_ids = make_positions_from_mask(attention_mask)[:, -s:]
        pos_embeds = self.embed_positions(position_ids + 2)

        if self.project_in is not None:
            inputs_embeds = self.project_in(inputs_embeds)

        hidden_states = inputs_embeds + pos_embeds
        hidden_states = self.embed_dropout(hidden_states,
                                           deterministic=deterministic)

        # layerdrop (modelling_cross_attention.py:581-584): at train time
        # each decoder layer (and its interleaved cross layer — the
        # reference's `continue` skips both) is bypassed with prob
        # cfg.layerdrop. Branchless under jit: compute, then select.
        drop_rngs = None
        if not deterministic and cfg.layerdrop > 0.0:
            drop_rngs = jax.random.split(self.make_rng("dropout"),
                                         len(self.layers))

        new_caches: List[Optional[Cache]] = []
        n_cross = 0
        for idx, layer in enumerate(self.layers):
            residual_states = hidden_states
            hidden_states, new_cache = layer(
                hidden_states, attention_mask, None, None,
                caches[idx] if caches is not None else None,
                prefix_kvs[idx] if prefix_kvs is not None else None,
                deterministic)
            new_caches.append(new_cache)
            if (cfg.cross_attention and neighbor_embeds is not None
                    and (idx + 1) % cfg.neighbor_layer_wise == 0
                    and n_cross < cfg.num_neighbor_layers):
                hidden_states, _ = self.neighbor_layers[n_cross](
                    hidden_states, attention_mask, neighbor_embeds,
                    neighbor_mask, None, None, deterministic)
                n_cross += 1
            if drop_rngs is not None:
                keep = jax.random.bernoulli(drop_rngs[idx],
                                            1.0 - cfg.layerdrop)
                hidden_states = jnp.where(keep, hidden_states,
                                          residual_states)

        if self.final_layer_norm is not None:
            hidden_states = self.final_layer_norm(hidden_states)
        if self.project_out is not None:
            hidden_states = self.project_out(hidden_states)
        return hidden_states, (new_caches if caches is not None else None)


class OPTForCausalLM(nn.Module):
    """OPT with LM head. Returns (logits, caches); loss in train/losses.py."""

    config: OPTConfig

    def setup(self):
        cfg = self.config
        self.decoder = OPTDecoder(cfg)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        inputs_embeds: Optional[jax.Array] = None,
        neighbor_embeds: Optional[jax.Array] = None,
        neighbor_mask: Optional[jax.Array] = None,
        caches: Optional[List[Cache]] = None,
        prefix_kvs: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
        position_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_hidden: bool = False,
    ):
        cfg = self.config
        hidden_states, new_caches = self.decoder(
            input_ids=input_ids, attention_mask=attention_mask,
            inputs_embeds=inputs_embeds, neighbor_embeds=neighbor_embeds,
            neighbor_mask=neighbor_mask, caches=caches, prefix_kvs=prefix_kvs,
            position_ids=position_ids, deterministic=deterministic)
        if return_hidden:
            # pre-head states (post project_out: already in the tied
            # embedding's width) for the vocab-chunked CE, which folds the
            # head matmul into the loss (train/losses.py chunked_ce)
            assert cfg.tie_word_embeddings, "chunked CE needs the tied head"
            return hidden_states, new_caches
        if cfg.tie_word_embeddings:
            logits = self.decoder.embed_tokens.attend(hidden_states)
        else:
            logits = self.lm_head(hidden_states)
        return logits, new_caches

    def embed(self, input_ids: jax.Array) -> jax.Array:
        """Token embedding lookup (for inputs_embeds fusion paths)."""
        return self.decoder.embed_tokens(input_ids)
