"""T5 encoder-decoder LM (flax).

Counterpart of the reference's `AutoModelForSeq2SeqLM` T5 path
(modelling_self_attention.py:65-68): relative position biases, RMSNorm,
unscaled attention, relu or gated-gelu FFN, tied LM head with d_model**-0.5
scaling, and training dropout at the HF sites (embedding, each residual,
FF inner, final norm, and the attention probabilities inside every
T5Attention — HF T5Config default dropout_rate=0.1, which the reference
trains with). Decoder supports KV-cache greedy decode (fixing the
reference's broken generate, SURVEY Q5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmgl_tpu.models.layers import RMSNorm
from mmgl_tpu.ops.attention import multi_head_attention
from mmgl_tpu.ops.dropout import FastDropout

Cache = Dict[str, jax.Array]


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_decoder_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dropout_rate: float = 0.1   # HF T5Config default; the reference trains with it
    feed_forward_proj: str = "relu"  # or "gated-gelu"
    tie_word_embeddings: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # None = auto-dispatch (Pallas bias kernel on TPU), False = XLA only
    use_pallas: Optional[bool] = None

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def _relative_position_bucket(relative_position, bidirectional: bool,
                              num_buckets: int, max_distance: int):
    """T5's log-binned relative position bucketing."""
    ret = 0
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(relpos_table: jax.Array, q_len: int, k_len: int,
                          bidirectional: bool, num_buckets: int,
                          max_distance: int, q_offset: int = 0) -> jax.Array:
    """(1, H, q_len, k_len) additive bias from the bucket embedding table."""
    ctx = jnp.arange(q_len)[:, None] + q_offset
    mem = jnp.arange(k_len)[None, :]
    buckets = _relative_position_bucket(mem - ctx, bidirectional,
                                        num_buckets, max_distance)
    bias = relpos_table[buckets]            # (q, k, H)
    return bias.transpose(2, 0, 1)[None]    # (1, H, q, k)


class T5Attention(nn.Module):
    config: T5Config
    causal: bool = False

    def setup(self):
        cfg = self.config
        dense = dict(use_bias=False, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)
        self.q = nn.Dense(cfg.inner_dim, **dense)
        self.k = nn.Dense(cfg.inner_dim, **dense)
        self.v = nn.Dense(cfg.inner_dim, **dense)
        self.o = nn.Dense(cfg.d_model, **dense)

    def __call__(self, hidden_states, kv_states=None, kv_mask=None,
                 position_bias=None, cache: Optional[Cache] = None,
                 prefix_kv=None, deterministic: bool = True):
        cfg = self.config
        b, s, _ = hidden_states.shape
        h, d = cfg.num_heads, cfg.d_kv
        src = kv_states if kv_states is not None else hidden_states
        q = self.q(hidden_states).reshape(b, s, h, d)
        k = self.k(src).reshape(b, src.shape[1], h, d)
        v = self.v(src).reshape(b, src.shape[1], h, d)

        causal = self.causal
        new_cache = None
        if cache is not None and kv_states is None:
            idx = cache["index"]
            merged_k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0))
            merged_v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0))
            new_cache = {"k": merged_k, "v": merged_v, "index": idx + s}
            if s == 1:
                k, v = merged_k, merged_v
                max_len = k.shape[1]
                valid = jnp.arange(max_len)[None, :] < (idx + s)
                if kv_mask is not None and kv_mask.shape[1] < max_len:
                    pad = jnp.ones((b, max_len - kv_mask.shape[1]),
                                   kv_mask.dtype)
                    kv_mask = jnp.concatenate([kv_mask, pad], axis=1)
                kv_mask = (valid if kv_mask is None
                           else kv_mask.astype(bool) & valid)
                causal = False
            # else: prefill — causal over the current segment (empty cache)

        if prefix_kv is not None and kv_states is None:
            # prefix tuning: learned K/V prepended; zero position bias and
            # always-attendable mask for the virtual slots
            pk, pv = prefix_kv  # (P, H, D)
            p = pk.shape[0]
            pk = jnp.broadcast_to(pk[None], (b,) + pk.shape).astype(k.dtype)
            pv = jnp.broadcast_to(pv[None], (b,) + pv.shape).astype(v.dtype)
            k = jnp.concatenate([pk, k], axis=1)
            v = jnp.concatenate([pv, v], axis=1)
            if kv_mask is not None:
                ones = jnp.ones((b, p), kv_mask.dtype)
                kv_mask = jnp.concatenate([ones, kv_mask], axis=1)
            if position_bias is not None:
                zeros = jnp.zeros(position_bias.shape[:3] + (p,),
                                  position_bias.dtype)
                position_bias = jnp.concatenate([zeros, position_bias],
                                                axis=3)
            if causal:
                # causal mask in xla_attention aligns ends, so prefix slots
                # (earliest keys) stay visible to every query
                pass

        # T5 attention is UNscaled (scale folded into init). HF T5 drops the
        # softmax probabilities at dropout_rate during training (ADVICE r3:
        # torch T5Attention's nn.functional.dropout on attn_weights). On TPU
        # bias + prob-dropout run fused in the Pallas bias kernel.
        rate = 0.0 if deterministic else cfg.dropout_rate
        drop_rng = self.make_rng("dropout") if rate > 0.0 else None
        out = multi_head_attention(q, k, v, kv_mask=kv_mask,
                                   bias=position_bias, causal=causal,
                                   scale=1.0, dropout_rate=rate,
                                   dropout_rng=drop_rng,
                                   use_pallas=cfg.use_pallas)
        return self.o(out.reshape(b, s, cfg.inner_dim)), new_cache


class T5FFN(nn.Module):
    config: T5Config

    def setup(self):
        cfg = self.config
        dense = dict(use_bias=False, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)
        self.gated = "gated" in cfg.feed_forward_proj
        if self.gated:
            self.wi_0 = nn.Dense(cfg.d_ff, **dense)
            self.wi_1 = nn.Dense(cfg.d_ff, **dense)
        else:
            self.wi = nn.Dense(cfg.d_ff, **dense)
        self.wo = nn.Dense(cfg.d_model, **dense)
        self.dropout = FastDropout(rate=cfg.dropout_rate)

    def __call__(self, x, deterministic: bool = True):
        if self.gated:
            h = jax.nn.gelu(self.wi_0(x), approximate=True) * self.wi_1(x)
        else:
            h = jax.nn.relu(self.wi(x))
        return self.wo(self.dropout(h, deterministic=deterministic))


class T5Block(nn.Module):
    config: T5Config
    is_decoder: bool = False

    def setup(self):
        cfg = self.config
        self.self_attn = T5Attention(cfg, causal=self.is_decoder)
        self.self_attn_norm = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype,
                                      cfg.param_dtype)
        if self.is_decoder:
            self.cross_attn = T5Attention(cfg, causal=False)
            self.cross_attn_norm = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype,
                                           cfg.param_dtype)
        self.ffn = T5FFN(cfg)
        self.ffn_norm = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype,
                                cfg.param_dtype)
        self.dropout = FastDropout(rate=cfg.dropout_rate)

    def __call__(self, hidden_states, attention_mask=None, position_bias=None,
                 encoder_states=None, encoder_mask=None,
                 cache: Optional[Cache] = None, prefix_kv=None,
                 deterministic: bool = True):
        attn, new_cache = self.self_attn(
            self.self_attn_norm(hidden_states), kv_mask=attention_mask,
            position_bias=position_bias, cache=cache, prefix_kv=prefix_kv,
            deterministic=deterministic)
        hidden_states = hidden_states + self.dropout(
            attn, deterministic=deterministic)
        if self.is_decoder and encoder_states is not None:
            attn, _ = self.cross_attn(self.cross_attn_norm(hidden_states),
                                      kv_states=encoder_states,
                                      kv_mask=encoder_mask,
                                      deterministic=deterministic)
            hidden_states = hidden_states + self.dropout(
                attn, deterministic=deterministic)
        ffn = self.ffn(self.ffn_norm(hidden_states),
                       deterministic=deterministic)
        return hidden_states + self.dropout(
            ffn, deterministic=deterministic), new_cache


class T5Stack(nn.Module):
    config: T5Config
    is_decoder: bool = False

    def setup(self):
        cfg = self.config
        n = cfg.num_decoder_layers if self.is_decoder else cfg.num_layers
        self.layers = [T5Block(cfg, self.is_decoder, name=f"layers_{i}")
                       for i in range(n)]
        self.final_layer_norm = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype,
                                        cfg.param_dtype)
        self.relpos_bias = nn.Embed(cfg.relative_attention_num_buckets,
                                    cfg.num_heads, dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)
        self.dropout = FastDropout(rate=cfg.dropout_rate)

    def __call__(self, inputs_embeds, attention_mask=None,
                 encoder_states=None, encoder_mask=None,
                 caches: Optional[List[Cache]] = None,
                 position_offset: int = 0, prefix_kvs=None,
                 deterministic: bool = True):
        cfg = self.config
        s = inputs_embeds.shape[1]
        # single-step decode attends the whole cache buffer; prefill (s>1)
        # attends only the current segment
        k_len = caches[0]["k"].shape[1] if (caches is not None and s == 1) else s
        bias = compute_position_bias(
            self.relpos_bias.embedding.astype(cfg.dtype), s, k_len,
            bidirectional=not self.is_decoder,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
            q_offset=position_offset)
        hidden_states = self.dropout(inputs_embeds,
                                     deterministic=deterministic)
        new_caches: List[Optional[Cache]] = []
        for i, layer in enumerate(self.layers):
            hidden_states, new_cache = layer(
                hidden_states, attention_mask, bias, encoder_states,
                encoder_mask, caches[i] if caches is not None else None,
                prefix_kvs[i] if prefix_kvs is not None else None,
                deterministic=deterministic)
            new_caches.append(new_cache)
        out = self.dropout(self.final_layer_norm(hidden_states),
                           deterministic=deterministic)
        return out, (new_caches if caches is not None else None)


def t5_init_cache(config: T5Config, batch: int, max_len: int) -> List[Cache]:
    h, d = config.num_heads, config.d_kv
    return [
        {
            "k": jnp.zeros((batch, max_len, h, d), config.dtype),
            "v": jnp.zeros((batch, max_len, h, d), config.dtype),
            "index": jnp.zeros((), jnp.int32),
        }
        for _ in range(config.num_decoder_layers)
    ]


def shift_right(labels: jax.Array, decoder_start_token_id: int,
                pad_token_id: int) -> jax.Array:
    """HF T5 label shift: decoder inputs = [start, labels[:-1]], -100 -> pad."""
    shifted = jnp.roll(labels, 1, axis=-1).at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


class T5ForConditionalGeneration(nn.Module):
    config: T5Config

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
                               param_dtype=cfg.param_dtype)
        self.encoder = T5Stack(cfg, is_decoder=False)
        self.decoder = T5Stack(cfg, is_decoder=True)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)

    def encode(self, input_ids=None, attention_mask=None, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.shared(input_ids)
        out, _ = self.encoder(inputs_embeds, attention_mask)
        return out

    def decode(self, decoder_input_ids, encoder_states, attention_mask=None,
               decoder_mask=None, caches=None, position_offset: int = 0,
               prefix_kvs=None):
        cfg = self.config
        x = self.shared(decoder_input_ids)
        hidden, new_caches = self.decoder(
            x, decoder_mask, encoder_states, attention_mask, caches,
            position_offset, prefix_kvs)
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model ** -0.5)
            logits = self.shared.attend(hidden)
        else:
            logits = self.lm_head(hidden)
        return logits, new_caches

    def __call__(self, input_ids=None, attention_mask=None, labels=None,
                 decoder_input_ids=None, inputs_embeds=None,
                 decoder_attention_mask=None, prefix_kvs=None,
                 deterministic: bool = True):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.shared(input_ids)
        enc, _ = self.encoder(inputs_embeds, attention_mask,
                              deterministic=deterministic)
        if decoder_input_ids is None:
            decoder_input_ids = shift_right(labels, cfg.decoder_start_token_id,
                                            cfg.pad_token_id)
        x = self.shared(decoder_input_ids)
        hidden, _ = self.decoder(x, decoder_attention_mask, enc,
                                 attention_mask, None, 0, prefix_kvs,
                                 deterministic=deterministic)
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model ** -0.5)
            logits = self.shared.attend(hidden)
        else:
            logits = self.lm_head(hidden)
        return logits

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.shared(input_ids)
