"""Prompt / prefix tuning as explicit parameter modules.

Counterparts of the HF PromptTuningConfig / PrefixTuningConfig paths
(modelling_self_attention.py:88-99): 20 virtual tokens by default.

  * PromptTuning: learned embeddings prepended to `inputs_embeds` (mask and
    labels extended by the caller — fusion.py handles that).
  * PrefixTuning: learned per-layer K/V prefixes injected into every
    self-attention layer (models/opt.py OPTAttention.prefix_kv).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PromptTuning(nn.Module):
    num_virtual_tokens: int
    hidden_size: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_size: int) -> jax.Array:
        table = self.param(
            "embedding", nn.initializers.normal(0.02),
            (self.num_virtual_tokens, self.hidden_size), self.param_dtype)
        return jnp.broadcast_to(table[None], (batch_size,) + table.shape)


class PrefixTuning(nn.Module):
    """Per-layer learned K/V prefixes: returns [(k, v)] * num_layers, each
    (num_virtual_tokens, heads, head_dim)."""

    num_layers: int
    num_virtual_tokens: int
    num_heads: int
    head_dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self) -> List[Tuple[jax.Array, jax.Array]]:
        shape = (self.num_layers, 2, self.num_virtual_tokens,
                 self.num_heads, self.head_dim)
        table = self.param("kv", nn.initializers.normal(0.02), shape,
                           self.param_dtype)
        return [(table[i, 0], table[i, 1]) for i in range(self.num_layers)]
