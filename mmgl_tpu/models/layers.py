"""Shared model building blocks."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

ACT2FN: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
}


class LoRADense(nn.Module):
    """Dense layer with an optional low-rank adapter (y = xW + b + a*(x A) B).

    JAX-idiomatic PEFT: the adapter params live in the same pytree under
    `lora_a`/`lora_b`; the trainability split is a parameter mask
    (peft/masks.py), not a module wrapper. Covers the reference's LoRA intent
    (modelling_self_attention.py:79-87) with module names that actually match
    our q/v projections (fixing SURVEY §3.6 Q8).
    """

    features: int
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(x)
        if self.lora_rank > 0:
            a = self.param(
                "lora_a",
                nn.initializers.he_uniform(),
                (x.shape[-1], self.lora_rank), self.param_dtype,
            )
            b = self.param(
                "lora_b", nn.initializers.zeros,
                (self.lora_rank, self.features), self.param_dtype,
            )
            h = x
            if self.lora_dropout > 0.0 and not deterministic:
                h = nn.Dropout(rate=self.lora_dropout, deterministic=False)(h)
            scale = self.lora_alpha / self.lora_rank
            y = y + (h @ a.astype(self.dtype)) @ b.astype(self.dtype) * scale
        return y


class RMSNorm(nn.Module):
    """T5-style layer norm: no mean subtraction, no bias."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                            self.param_dtype)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon)
        return (weight * x).astype(self.dtype)


def make_positions_from_mask(attention_mask: jax.Array) -> jax.Array:
    """OPT/Roberta position scheme: cumsum of the mask, pads pinned.

    Matches MPTLearnedPositionalEmbedding.forward
    (modelling_cross_attention.py:135-145): positions = cumsum(mask)*mask - 1,
    so padded slots read index -1 (the caller adds the model's offset).
    """
    mask = attention_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask - 1
