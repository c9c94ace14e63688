"""Attention dispatch: Pallas fused kernels on TPU, XLA einsum fallback.

This is the framework's single attention entry point; every model (OPT, T5,
MPT cross-attn, Roberta, CLIP) routes through it. Semantics match the
reference's stock torch attention (modelling_cross_attention.py:212-258):
scaled QK^T, additive mask, fp32 softmax, PV — but fused on TPU instead of
materializing the (B,H,Sq,Sk) weights in HBM.

Layout: q,k,v are (batch, seq, heads, head_dim) — BSHD, flax convention.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: keeps fully-masked rows finite

# Smallest KV length the fused kernel is dispatched for; below it the
# kernel is launch-bound and XLA's unfused path wins (bench.py --kernel).
# Env-overridable for on-chip dispatch tuning.
PALLAS_MIN_KV = int(os.environ.get("MMGL_PALLAS_MIN_KV", "128"))

# Smallest query length the NO-DROPOUT bias kernel is dispatched for. The
# r4 row-serial schedule lost the short-query T5 decoder shapes to XLA
# (dec 128x128 ~1.35x, cross 128x512 3.2x), hence 384; the r5 batched
# fwd/bwd kernels target exactly those shapes — re-measure with
# MMGL_BIAS_MIN_SQ=0 (scripts/ab_t5_attention.py) before changing the
# default. (Training always dispatches: with prob-dropout the kernel wins
# every shape.)
BIAS_MIN_SQ = int(os.environ.get("MMGL_BIAS_MIN_SQ", "384"))


def _supports_pallas() -> bool:
    return jax.default_backend() == "tpu"


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: Optional[jax.Array] = None,
    pairwise_mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused multi-head attention.

    Args:
      q: (B, Sq, H, D) queries.
      k, v: (B, Sk, H, D) keys/values (H may be 1 for MQA-style broadcast).
      kv_mask: (B, Sk) 1/0 key validity mask (e.g. padding or neighbor mask).
      pairwise_mask: (B, Sq, Sk) boolean/0-1 mask for arbitrary patterns
        (prefix-LM etc.); XLA path only.
      bias: additive (B or 1, H or 1, Sq, Sk) bias (e.g. T5 relative positions);
        XLA path only for now.
      causal: apply causal masking (queries attend to keys <= their position).
      scale: QK scale; default D**-0.5.
      dropout_rate/dropout_rng: attention-prob dropout (fused in-kernel on
        the Pallas bias path; XLA bernoulli otherwise).
      use_pallas: force kernel choice; None = auto.
      interpret: run the Pallas kernel in interpreter mode (CPU tests).

    Returns:
      (B, Sq, H, D) attention output in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    wants_pallas = use_pallas if use_pallas is not None else _supports_pallas()
    shapes_ok = (
        pairwise_mask is None
        and q.shape[-1] <= 256
        and q.shape[1] >= 32  # single-step decode: XLA is cheaper than a kernel launch
        # measured on v5e: Pallas wins causal 640x640 (2.1x) and 512x512
        # text (2.7x); XLA wins the tiny 64-token neighbor cross memory
        and k.shape[1] >= PALLAS_MIN_KV
        # lane-misaligned sequences lose in the kernel: the 197-patch CLIP
        # shape pads 197->256 and measured 101.5 ms (Pallas) vs 67.4 (XLA)
        # for the 192-image tower forward (scripts/ab_split_tower.py)
        and q.shape[1] % 128 == 0
        and k.shape[1] % 128 == 0
    )
    # bias / attention-prob dropout route to the bias-variant kernel
    # (batch-shared bias only — T5's relative positions are (1, H, Sq, Sk)).
    # Measured fwd+bwd on v5e at the t5-base shapes, b=16 h=12 d=64
    # (scripts/ab_t5_attention.py + re-measures in chip_runner2 with
    # n2=100: sub-ms single-shot timings over the tunnel carry ~2x noise):
    #   no dropout: enc 512x512 pallas 1.006 ms vs XLA 2.485 (2.47x WIN);
    #     dec 128x128 causal ~0.31-0.37 vs 0.24-0.28 (~1.35x loss);
    #     cross 128x512 0.520 vs 0.161 (3.2x loss) — at short query
    #     blocks the per-program overhead and the serialized
    #     dbias-accumulation grid beat the fusion win, so sq >= 384 gates
    #     the no-dropout kernel.
    #   WITH prob-dropout 0.1 (training): the kernel wins EVERY shape —
    #     enc 1.320 vs 7.868 (5.96x), cross 1.910 vs 2.533 (1.33x), dec
    #     wins too — XLA pays threefry mask generation + an
    #     HBM-materialized (B,H,Sq,Sk) keep mask, the in-kernel hardware
    #     PRNG pays neither.
    # In-kernel dropout requires the TPU hardware PRNG (no interpret mode).
    wants_bias_kernel = (bias is not None or dropout_rate > 0.0)
    bias_ok = (
        shapes_ok
        # VMEM ceiling: _bwd_bias holds full (sq, sk) fp32 logits/p/dlogits
        # plus an fp32 dbias block in one unblocked program; cap at the
        # measured envelope so oversized shapes fall back to XLA instead of
        # failing VMEM allocation at compile/run time.
        and q.shape[1] <= 768
        and k.shape[1] <= 1024
        and (q.shape[1] >= BIAS_MIN_SQ or dropout_rate > 0.0)
        and (bias is None or (bias.ndim == 4 and bias.shape[0] == 1))
        and (dropout_rate == 0.0 or
             (dropout_rng is not None and not interpret))
    )
    if wants_pallas and wants_bias_kernel and bias_ok:
        from mmgl_tpu.ops.flash_attention import flash_attention_bias

        return flash_attention_bias(
            q, k, v, bias=bias, kv_mask=kv_mask, causal=causal, scale=scale,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            interpret=interpret,
        )
    if wants_pallas and not wants_bias_kernel and shapes_ok:
        # Aligned self-attention prefers the transpose-free allheads
        # schedule: q/k/v stay in the (B, S, H*D) layout the projections
        # produce, so the ~17 ms/step of BSHD<->(B*H,S,D) physical copies
        # the captured trace charged to the per-(b,h) kernel disappear.
        # Measured on v5e (scripts/tune_attention_allheads.py): 640-causal
        # 3.63 -> 2.58 ms fwd+bwd (1.41x), 512 text-tower b=32 2.01 -> 1.85,
        # b=96 6.59 -> 5.64; grads bit-identical. Envelope: per-head fp32
        # (S, S) temporaries must fit VMEM -> sq <= 768.
        from mmgl_tpu.ops.flash_attention import (_allheads_hp,
                                                  flash_attention,
                                                  flash_attention_allheads)

        allheads_ok = (
            q.shape[1] == k.shape[1]
            and k.shape[2] == q.shape[2]      # no MQA broadcast
            and q.shape[1] <= 768
            and q.shape[2] % _allheads_hp(q.shape[-1]) == 0
        )
        if allheads_ok:
            return flash_attention_allheads(
                q, k, v, kv_mask=kv_mask, causal=causal, scale=scale,
                interpret=interpret,
            )
        return flash_attention(
            q, k, v, kv_mask=kv_mask, causal=causal, scale=scale,
            interpret=interpret,
        )
    # lane-misaligned self-attention (CLIP towers: 197 patches / 77 text
    # tokens) → one-program-per-sequence fused-heads kernel: 0.400 ms vs
    # 1.489 XLA at the production 197-patch b=192 shape on v5e
    # (scripts/tune_vision_attention.py, 3.72x). Envelope: padded logits
    # (SP, SP) fp32 + 4 (SP, H*D) tensors must fit VMEM.
    sp = q.shape[1] + (-q.shape[1]) % 128
    fused_heads_ok = (
        pairwise_mask is None
        and bias is None
        and dropout_rate == 0.0
        and q.shape[1] == k.shape[1]          # self-attention
        and k.shape[2] == q.shape[2]          # no MQA broadcast
        and q.shape[1] % 128 != 0             # aligned shapes: kernels above
        and 64 <= q.shape[1] and sp <= 512
        and q.shape[2] * q.shape[-1] <= 1024
    )
    if wants_pallas and fused_heads_ok:
        from mmgl_tpu.ops.flash_attention import fused_heads_attention

        return fused_heads_attention(
            q, k, v, kv_mask=kv_mask, causal=causal, scale=scale,
            interpret=interpret,
        )
    return xla_attention(
        q, k, v, kv_mask=kv_mask, pairwise_mask=pairwise_mask, bias=bias,
        causal=causal, scale=scale, dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
    )


def xla_attention(
    q, k, v, *, kv_mask=None, pairwise_mask=None, bias=None, causal=False,
    scale=None, dropout_rate=0.0, dropout_rng=None,
):
    """Reference attention: einsum + fp32 softmax. XLA fuses the elementwise ops."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if k.shape[2] == 1 and h > 1:  # broadcast single-head KV
        k = jnp.broadcast_to(k, (b, sk, h, d))
        v = jnp.broadcast_to(v, (b, sk, h, v.shape[-1]))

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :].astype(bool), logits, NEG_INF)
    if pairwise_mask is not None:
        logits = jnp.where(pairwise_mask[:, None, :, :].astype(bool), logits, NEG_INF)
    if causal:
        q_idx = jnp.arange(sq)[:, None] + (sk - sq)  # align ends (KV cache decode)
        k_idx = jnp.arange(sk)[None, :]
        logits = jnp.where((q_idx >= k_idx)[None, None], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)

    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
