"""TPU-fast dropout.

Measured on v5e at the production OPT-125M/640-token shape, the 25 dropout
sites (embed + 2 per layer, p=0.1; reference applies the same —
modelling_cross_attention.py:472,340,365) cost 18.7 ms of the 168 ms
train step with the stock bernoulli path even on the rbg hardware-RNG
stream (scripts/ablate_step.py): jax.random.bernoulli draws 32 random bits
per element and converts to f32 before comparing.

This module thresholds raw uint8 lanes instead — 8 generated bits per
element, no int->float conversion — which quantizes the keep probability
to ceil/round(keep*256)/256 (0.9 -> 230/256 = 0.8984...). The inverted
scale uses the quantized probability, so E[dropout(x)] == x holds exactly.
The quantized-p path is TPU-only: CPU keeps flax's nn.Dropout bit-for-bit
so CPU-run parity and trajectory tests are unaffected (same pattern as the
rbg dropout stream, train/steps.py dropout_stream_key).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def uint8_dropout(x: jax.Array, rng: jax.Array, rate: float) -> jax.Array:
    """Dropout from uint8 thresholding; quantizes keep to n/256.

    Unbiased: the inverted scale uses the QUANTIZED keep probability
    thr/256, so E[out] == x exactly. Backend-independent math (tested on
    CPU); FastDropout routes here only on TPU where the 4x bit saving
    pays."""
    keep = 1.0 - rate
    thr = int(round(keep * 256.0))
    if thr >= 256:
        # rate <= ~0.2%: keep quantizes to 256/256 == 1.0 — dropout is a
        # no-op at uint8 resolution (and jnp.uint8(256) would overflow).
        return x
    thr = max(1, thr)
    bits = jax.random.bits(rng, x.shape, jnp.uint8)
    mask = bits < jnp.uint8(thr)
    scale = jnp.asarray(256.0 / thr, x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros((), x.dtype))


class FastDropout(nn.Module):
    """Drop-in nn.Dropout: uint8-threshold masks on TPU, stock elsewhere."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        if deterministic or self.rate == 0.0:
            return x
        if jax.default_backend() != "tpu":
            return nn.Dropout(rate=self.rate, deterministic=False)(
                x, rng=self.make_rng("dropout"))
        return uint8_dropout(x, self.make_rng("dropout"), self.rate)
