"""Pallas TPU fused attention (forward + custom VJP).

Design point: MMGL's attention shapes are small and fixed — decoder-only
sequences of 512+128=640 tokens, encoder 512, neighbor cross-attention KV of
(max_text+max_image) x n_tokens = 64 soft tokens (SURVEY §5 "long-context").
At these sizes the whole K/V for one (batch, head) fits comfortably in VMEM,
so instead of a streaming flash kernel we fuse the entire row-block softmax:

  forward : grid (B*H, Sq/BQ) — one MXU pass QK^T, fp32 softmax in VMEM,
            one MXU pass PV, plus a per-row logsumexp residual for the
            backward. The (Sq, Sk) weight matrix never touches HBM
            (the reference materializes it per layer via torch.bmm —
            modelling_cross_attention.py:212-258).
  backward: one program per (b,h) — full recompute of P, then
            dS = P*(dO V^T - rowsum(dO*O)) giving dQ, dK, dV in two MXU
            passes each. A blocked, triangle-skipping causal backward
            (128-row tiles, P from the saved logsumexp) exists behind
            MMGL_BLOCKED_BWD=1 and was MEASURED SLOWER at the production
            shape: 7.2 vs 3.3 ms fwd+bwd (b=32 h=12 s=640, v5e) — with
            K/V fully VMEM-resident the dense program loads each tensor
            once, while the blocked passes reload K/V (dQ) and Q/dO (dKV)
            per tile, so the 45% FLOP skip loses to 5x read amplification.
            It is the right schedule only when S is too long for the
            one-program backward's VMEM envelope (S >~ 1024).

Envelope: Sk*D and Sq*Sk fp32 must fit VMEM => seq <= ~1024 for the fused
backward at D=64. Longer sequences fall back to XLA attention (ops/attention.py),
which XLA pipelines itself. Masking: key-validity mask (padding / neighbor
pos_id>0 semantics, modelling_self_attention.py:268-269) plus optional causal.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BQ = 256  # default query rows per program in the forward kernel
BK = 256  # key chunk per fori_loop step in the streaming causal forward


def _pick_bq(sq: int) -> int:
    """Query-block size: prefer exact tiling over the default 256.

    MMGL's hot decoder shape is sq=640; BQ=256 pads it to 768 (20% wasted
    query rows), BQ=320 tiles it exactly — measured 2.11 vs 2.58 ms for the
    b=32 h=12 causal fwd kernel on v5e (scripts/tune_attention.py). 320 is
    sublane-legal (multiple of 8); candidates stay >=128 so the (8,128)
    tiling rule holds.
    """
    for cand in (512, 384, 320, 256, 128):
        if sq % cand == 0:
            return cand
    return BQ

import os as _os

# Streaming (causal-block-skipping online-softmax) vs dense causal forward.
# Measured on v5e at MMGL's production 640-token shape: dense wins by ~1%
# full-step (191.2 vs 192.9 ms) — the sequential softmax chain offsets the
# upper-triangle FLOP skip when K/V already sit in VMEM. Dense is the
# default; the streaming kernel stays selectable for longer-sequence
# experiments where the skipped fraction grows.
_CAUSAL_STREAM = _os.environ.get("MMGL_CAUSAL_STREAM", "0") == "1"

# Blocked triangle-skipping causal backward — measured 2.2x SLOWER than the
# dense one-program backward at the production 640-token shape (see module
# docstring); selectable for longer-sequence experiments.
_BLOCKED_BWD = _os.environ.get("MMGL_BLOCKED_BWD", "0") == "1"


def _pad_to(x: jax.Array, axis: int, mult: int, value=0.0) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref=None, *, scale,
                causal, sq, sk, bq):
    # matmul inputs stay in their native dtype (bf16 on TPU) with fp32
    # accumulation — upcasting q/k/v first would force fp32 MXU passes at a
    # fraction of the bf16 rate. Softmax math is fp32; probs are cast back
    # to the value dtype for PV exactly like the XLA path (attention.py).
    qblk = q_ref[0]                              # (BQ, D)
    k = k_ref[0]                                 # (Sk, D)
    v = v_ref[0]                                 # (Sk, D)
    kv_mask = mask_ref[0, 0]                     # (Sk,) int32

    logits = jax.lax.dot_general(
        qblk, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # (BQ, Sk) fp32

    logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
    if causal:
        j = pl.program_id(1)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + j * bq
        k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        # align sequence ends so KV-cache decode (sq < sk) stays causal
        logits = jnp.where(q_idx + (sk - sq) >= k_idx, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if l_ref is not None:
        # per-row logsumexp residual for the blocked backward; stored (bq, 1)
        # because a (1, bq) block with bq=320 breaks the 128-lane tiling rule
        l_ref[0] = m + jnp.log(denom)
    p = p / denom
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _fwd_kernel_causal_stream(q_ref, k_ref, v_ref, mask_ref, o_ref,
                              l_ref=None, *, scale, sq, sk, bq):
    """Causal forward with online softmax + block skipping.

    Query block j only attends keys < (j+1)*BQ + (sk-sq); looping k in BK
    chunks with a data-dependent trip count skips the fully-masked upper
    triangle (~45% of the work at 640 tokens) that the dense kernel wastes
    MXU cycles on. K/V stay fully resident in VMEM — the loop bounds
    compute, not memory traffic.
    """
    j = pl.program_id(1)
    qblk = q_ref[0]                                        # (bq, D)
    sk_p = k_ref.shape[1]
    d = qblk.shape[1]

    limit = (j + 1) * bq + (sk - sq)          # exclusive causal key bound
    n_kb = jnp.minimum((limit + BK - 1) // BK, sk_p // BK)

    q_idx = (jax.lax.broadcasted_iota(jnp.int32, (bq, BK), 0)
             + j * bq + (sk - sq))

    def body(kb, carry):
        m_i, l_i, acc = carry
        k_chunk = k_ref[0, pl.ds(kb * BK, BK)]
        v_chunk = v_ref[0, pl.ds(kb * BK, BK)]
        mask_chunk = mask_ref[0, 0, pl.ds(kb * BK, BK)]
        logits = jax.lax.dot_general(
            qblk, k_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (bq, BK) fp32
        k_idx = (jax.lax.broadcasted_iota(jnp.int32, (bq, BK), 1) + kb * BK)
        ok = (mask_chunk[None, :] > 0) & (q_idx >= k_idx)
        logits = jnp.where(ok, logits, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(logits - m_new[:, None])
        l_new = l_i * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_chunk.dtype), v_chunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    if l_ref is not None:
        l_ref[0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, None]
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _fwd(q, k, v, kv_mask, scale, causal, interpret, with_lse=False):
    """q: (BH, Sq, D); k/v: (BH, Sk, D); kv_mask: (BH, Sk) int32.

    with_lse additionally returns the per-row logsumexp (the blocked
    backward's residual); the default skips that output entirely so the
    production forward is unchanged."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    bq = _pick_bq(sq)
    q_p = _pad_to(q, 1, bq)
    kv_mult = BK if causal else 128   # streaming kernel chunks K by BK
    k_p = _pad_to(k, 1, kv_mult)
    v_p = _pad_to(v, 1, kv_mult)
    mask_p = _pad_to(kv_mask, 1, kv_mult, value=0)[:, None, :]  # (bh,1,sk_p)
    sq_p, sk_p = q_p.shape[1], k_p.shape[1]

    if causal and _CAUSAL_STREAM:
        kernel = functools.partial(_fwd_kernel_causal_stream, scale=scale,
                                   sq=sq, sk=sk, bq=bq)
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                                   sq=sq, sk=sk, bq=bq)
    grid = (bh, sq_p // bq)
    out_shape = [jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, sq_p, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * sk_p * d,
            bytes_accessed=(q_p.size + k_p.size + v_p.size) * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, mask_p)
    if with_lse:
        out, lse = res
        return out[:, :sq], lse[:, :sq, 0]
    return res[0][:, :sq], None


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

BC = 128  # block edge for the blocked causal backward (exact at 640 = 5x128)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, l_ref, delta_ref,
                   dq_ref, *, scale, sq, sk, bq):
    """dQ for one query block: loop key chunks up to the causal limit.

    p is recomputed from the saved logsumexp (no full-row softmax pass), so
    the upper-triangle key chunks are genuinely skipped — the dense backward
    burns MXU cycles on them (~45% of the work at 640 tokens).
    """
    j = pl.program_id(1)
    qblk = q_ref[0]                              # (bq, D)
    do = do_ref[0]                               # (bq, D)
    lse = l_ref[0, 0]                            # (bq,) fp32
    delta = delta_ref[0, 0]                      # (bq,) fp32
    sk_p = k_ref.shape[1]
    d = qblk.shape[1]

    limit = (j + 1) * bq + (sk - sq)             # exclusive causal key bound
    n_kb = jnp.minimum((limit + BC - 1) // BC, sk_p // BC)
    q_idx = (jax.lax.broadcasted_iota(jnp.int32, (bq, BC), 0)
             + j * bq + (sk - sq))

    def body(kb, acc):
        k_chunk = k_ref[0, pl.ds(kb * BC, BC)]   # (BC, D)
        v_chunk = v_ref[0, pl.ds(kb * BC, BC)]
        mask_chunk = mask_ref[0, 0, pl.ds(kb * BC, BC)]
        s = jax.lax.dot_general(
            qblk, k_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (bq, BC)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, BC), 1) + kb * BC
        ok = (mask_chunk[None, :] > 0) & (q_idx >= k_idx)
        p = jnp.where(ok, jnp.exp(s - lse[:, None]), 0.0)     # (bq, BC)
        dp = jax.lax.dot_general(
            do, v_chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bq, BC)
        ds = (p * (dp - delta[:, None]) * scale).astype(qblk.dtype)
        return acc + jax.lax.dot_general(
            ds, k_chunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((bq, d), jnp.float32)
    dq_ref[0] = jax.lax.fori_loop(0, n_kb, body, acc0).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, l_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, sq, sk, bk):
    """dK/dV for one key block: loop query chunks from the causal start."""
    kb = pl.program_id(1)
    kblk = k_ref[0]                              # (bk, D)
    vblk = v_ref[0]
    mask_blk = mask_ref[0, 0]                    # (bk,)
    sq_p = q_ref.shape[1]
    d = kblk.shape[1]

    # first query chunk whose last row can causally see this key block
    start = jnp.maximum(0, (kb * bk - (sk - sq)) // BC)
    n_qb = sq_p // BC
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (BC, bk), 1) + kb * bk

    def body(qc, carry):
        dk_acc, dv_acc = carry
        q_chunk = q_ref[0, pl.ds(qc * BC, BC)]   # (BC, D)
        do_chunk = do_ref[0, pl.ds(qc * BC, BC)]
        lse_chunk = l_ref[0, 0, pl.ds(qc * BC, BC)]
        delta_chunk = delta_ref[0, 0, pl.ds(qc * BC, BC)]
        s = jax.lax.dot_general(
            q_chunk, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (BC, bk)
        q_idx = (jax.lax.broadcasted_iota(jnp.int32, (BC, bk), 0)
                 + qc * BC + (sk - sq))
        ok = (mask_blk[None, :] > 0) & (q_idx >= k_idx)
        p = jnp.where(ok, jnp.exp(s - lse_chunk[:, None]), 0.0)
        p_n = p.astype(q_chunk.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_n, do_chunk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bk, D)
        dp = jax.lax.dot_general(
            do_chunk, vblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (BC, bk)
        ds = (p * (dp - delta_chunk[:, None]) * scale).astype(q_chunk.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_chunk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bk, D)
        return dk_acc, dv_acc

    z = jnp.zeros((kblk.shape[0], d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(start, n_qb, body, (z, z))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _bwd_causal_blocked(q, k, v, kv_mask, scale, interpret, out, dout, lse):
    """Triangle-skipping two-pass backward for causal attention."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    q_p = _pad_to(q, 1, BC)
    do_p = _pad_to(dout, 1, BC)
    k_p = _pad_to(k, 1, BC)
    v_p = _pad_to(v, 1, BC)
    mask_p = _pad_to(kv_mask, 1, BC, value=0)[:, None, :]     # (bh, 1, sk_p)
    # delta_i = rowsum(dO_i * O_i); one fused elementwise pass, fp32
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    # padded q rows: lse pads with +inf-free zeros; p = exp(s - 0) could be
    # huge garbage, so pad lse with a large value to zero those rows out.
    # Row vectors are carried as (bh, 1, sq_p) so their blocks satisfy the
    # (8, 128) tiling rule (lane-major layout).
    lse_p = _pad_to(lse, 1, BC, value=1e30)[:, None, :]
    delta_p = _pad_to(delta, 1, BC)[:, None, :]
    sq_p, sk_p = q_p.shape[1], k_p.shape[1]

    q_spec = pl.BlockSpec((1, sq_p, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, sk_p), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, sq_p), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    qblk_spec = pl.BlockSpec((1, BC, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    qrow_spec = pl.BlockSpec((1, 1, BC), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, sq=sq, sk=sk, bq=BC),
        out_shape=jax.ShapeDtypeStruct(q_p.shape, q.dtype),
        grid=(bh, sq_p // BC),
        in_specs=[qblk_spec, k_spec, k_spec, mask_spec, qblk_spec,
                  qrow_spec, qrow_spec],
        out_specs=qblk_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=3 * bh * sq_p * sk_p * d,      # ~half the dense triangle
            bytes_accessed=(q_p.size + k_p.size + v_p.size)
            * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p // 2,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, mask_p, do_p, lse_p, delta_p)

    kblk_spec = pl.BlockSpec((1, BC, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    kmask_spec = pl.BlockSpec((1, 1, BC), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, sq=sq, sk=sk, bk=BC),
        out_shape=(
            jax.ShapeDtypeStruct(k_p.shape, k.dtype),
            jax.ShapeDtypeStruct(v_p.shape, v.dtype),
        ),
        grid=(bh, sk_p // BC),
        in_specs=[q_spec, kblk_spec, kblk_spec, kmask_spec, q_spec,
                  row_spec, row_spec],
        out_specs=(kblk_spec, kblk_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=7 * bh * sq_p * sk_p * d // 2,
            bytes_accessed=3 * (q_p.size + k_p.size + v_p.size)
            * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p // 2,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, mask_p, do_p, lse_p, delta_p)
    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, sq, sk):
    # native-dtype (bf16) matmul inputs, fp32 accumulation — see _fwd_kernel
    q = q_ref[0]                         # (Sq, D)
    k = k_ref[0]                         # (Sk, D)
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    kv_mask = mask_ref[0, 0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                            # (Sq, Sk) fp32
    logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(q_idx + (sk - sq) >= k_idx, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)   # (Sq, Sk) fp32
    p_n = p.astype(q.dtype)

    dv_ref[0] = jax.lax.dot_general(
        p_n, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                             # (Sq, Sk) fp32
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)   # (Sq, Sk)

    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _bwd(q, k, v, kv_mask, scale, causal, interpret, out, dout):
    bh, sq, d = q.shape
    sk = k.shape[1]
    q_p = _pad_to(q, 1, 128)
    o_p = _pad_to(out, 1, 128)
    do_p = _pad_to(dout, 1, 128)
    k_p = _pad_to(k, 1, 128)
    v_p = _pad_to(v, 1, 128)
    mask_p = _pad_to(kv_mask, 1, 128, value=0)[:, None, :]  # (bh, 1, sk_p)
    sq_p, sk_p = q_p.shape[1], k_p.shape[1]

    q_spec = pl.BlockSpec((1, sq_p, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, sk_p, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal, sq=sq, sk=sk),
        out_shape=(
            jax.ShapeDtypeStruct(q_p.shape, q.dtype),
            jax.ShapeDtypeStruct(k_p.shape, k.dtype),
            jax.ShapeDtypeStruct(v_p.shape, v.dtype),
        ),
        grid=(bh,),
        in_specs=[
            q_spec, k_spec, k_spec,
            pl.BlockSpec((1, 1, sk_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec, q_spec,
        ],
        out_specs=(q_spec, k_spec, k_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq_p * sk_p * d,
            bytes_accessed=3 * (q_p.size + k_p.size + v_p.size) * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, mask_p, do_p, o_p)
    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kv_mask, scale, causal, interpret):
    return _fwd(q, k, v, kv_mask, scale, causal, interpret)[0]


def _flash_fwd(q, k, v, kv_mask, scale, causal, interpret):
    out, lse = _fwd(q, k, v, kv_mask, scale, causal, interpret,
                    with_lse=causal and _BLOCKED_BWD)
    return out, (q, k, v, kv_mask, out, lse)


def _flash_bwd(scale, causal, interpret, res, dout):
    q, k, v, kv_mask, out, lse = res
    if causal and _BLOCKED_BWD:
        dq, dk, dv = _bwd_causal_blocked(q, k, v, kv_mask, scale, interpret,
                                         out, dout, lse)
    else:
        dq, dk, dv = _bwd(q, k, v, kv_mask, scale, causal, interpret,
                          out, dout)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# bias variant: additive position bias (T5 relative positions) + optional
# in-kernel attention-probability dropout
# ---------------------------------------------------------------------------
#
# T5's every attention carries a (1, H, Sq, Sk) batch-shared additive bias
# (models/t5.py compute_position_bias; reference trains t5-base via HF
# AutoModelForSeq2SeqLM, modelling_self_attention.py:65-68, whose
# T5Attention also DROPS the softmax probabilities at dropout_rate). Both
# features previously forced the entire T5 hot loop onto the unfused XLA
# path (VERDICT r3 missing #1). Design:
#
#  * layout is HEAD-major — (H*B, S, D), program index i = h*B + b — so the
#    batch-shared bias block for head h is revisited by B consecutive
#    programs: Pallas fetches it once per head instead of once per (b, h).
#    The backward accumulates dbias into the same revisited block
#    (dimension_semantics "arbitrary" serializes the grid, which a v5e's
#    single core does anyway).
#  * dropout runs INSIDE the kernel from the TPU hardware PRNG
#    (pltpu.prng_seed/prng_random_bits, seeded per (program, query-block)):
#    the (B, H, Sq, Sk) keep-mask never exists in HBM, and the backward
#    regenerates bit-identical masks from the same seeds. Keep probability
#    is thresholded at 32-bit resolution (quantization 2^-32). CPU keeps
#    the XLA bernoulli path (backend-split dropout, same policy as
#    ops/dropout.py — interpret mode has no TPU PRNG lowering).
#  * chain rule with prob-dropout m (0 or 1/keep): out = (p*m) @ V with
#    p = softmax(s);  delta = rowsum(dO*O) = <p, m*dp> so
#    dlogits = p * (m*dp - delta),  dbias = sum_b dlogits,
#    dq/dk from ds = dlogits * scale,  dv = (p*m)^T @ dO.


def _dropout_seed(rng: jax.Array) -> jax.Array:
    """(2,) int32 kernel seed: BOTH 32-bit halves of the JAX PRNG key.

    A single-word seed collides across steps/layers with birthday
    probability (~50% after ~2^16 draws); feeding the full 64 bits of key
    material to pltpu.prng_seed (which mixes an arbitrary list of words)
    keeps per-call dropout masks distinct for the life of a training run."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (2,), jnp.uint32), jnp.int32)


def _gen_keep_factor(seed0, seed1, i, j, shape, thr32, keep_inv):
    """(shape) f32 factor: keep_inv where kept, 0 where dropped.

    Deterministic per (seed0, seed1, i, j) — the backward regenerates the
    forward's exact mask by reseeding with the same tuple. The TPU lowering
    (tpu.prng_set_seed_32) accepts AT MOST two seed words on current
    libtpu — a third word fails Mosaic compile ("Setting seed with more
    than 2 values is not supported") — so the (i, j) block word is folded
    into both key halves instead: seed0^blk keeps blocks distinct within a
    call, seed1+blk*phi (odd golden-ratio multiplier) decorrelates the pair
    so two calls whose keys differ only in one half still produce distinct
    (word0, word1) tuples; cross-call collision resistance stays ~64-bit
    because (seed0, seed1) is fresh random per attention call. The comparison
    runs in SIGNED int32 space (threshold shifted by 2^31) because the TPU
    PRNG materializes int32 lanes — an unsigned-constant compare silently
    promotes and measured a 0.40 keep fraction for keep=0.9 on v5e."""
    blk = i * 65536 + j
    pltpu.prng_seed(seed0 ^ blk, seed1 + blk * (-1640531527))
    bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits(shape),
                                        jnp.int32)
    thr_signed = jnp.int32(thr32 - 2 ** 31)
    return jnp.where(bits < thr_signed, jnp.float32(keep_inv), 0.0)


def _fwd_bias_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, bias_ref,
                     o_ref, *, scale, causal, sq, sk, bq, thr32, keep_inv):
    i, j = pl.program_id(0), pl.program_id(1)
    qblk = q_ref[0]                              # (bq, D)
    k = k_ref[0]                                 # (sk_p, D)
    v = v_ref[0]
    kv_mask = mask_ref[0, 0]                     # (sk_p,)

    logits = jax.lax.dot_general(
        qblk, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0].astype(jnp.float32)  # (bq, sk_p)

    logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + j * bq
        k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(q_idx + (sk - sq) >= k_idx, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if thr32 is not None:
        p = p * _gen_keep_factor(seed_ref[0], seed_ref[1], i, j, p.shape,
                                 thr32, keep_inv)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _fwd_bias_kernel_batched(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                             bias_ref, o_ref, *, scale, causal, sq, sk,
                             bq, thr32, keep_inv, nbatch):
    """Batched bias forward: grid (H,), batch loop unrolled in-kernel.

    The per-(b,h) forward grid launches H*B programs of tiny work at the
    T5 decoder shapes (cross 128x512 measured 3.2x SLOWER than XLA
    no-dropout, r4) — here K/V/bias load once per head and the program
    count drops 16x. Dropout masks use the SAME per-(h*B+b, block) seeds
    as the per-(b,h) schedule, so either forward pairs with either
    backward bit-identically."""
    h = pl.program_id(0)
    bias = bias_ref[0].astype(jnp.float32)
    sq_p = bias.shape[0]
    for b in range(nbatch):
        q = q_ref[b]
        k = k_ref[b]
        v = v_ref[b]
        kv_mask = mask_ref[b, 0]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
        if causal:
            q_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(q_idx + (sk - sq) >= k_idx, logits, NEG_INF)

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if thr32 is not None:
            sk_p = logits.shape[1]
            blocks = [
                _gen_keep_factor(seed_ref[0], seed_ref[1],
                                 h * nbatch + b, j, (bq, sk_p), thr32,
                                 keep_inv)
                for j in range(sq_p // bq)
            ]
            mfac = blocks[0] if len(blocks) == 1 else jnp.concatenate(
                blocks, 0)
            p = p * mfac
        o_ref[b] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fwd_bias_batched_ok(sq_p: int, sk_p: int, d: int, nbatch: int) -> bool:
    """Forward working set: q+o blocks, k+v blocks, bias, ~2 fp32
    transients per b."""
    mode = os.environ.get("MMGL_BIAS_FWD_BATCHED", "auto")
    if mode == "0":
        return False
    blocks = (2 * nbatch * sq_p * d * 2 + 2 * nbatch * sk_p * d * 2
              + sq_p * sk_p * 4 + 2 * sq_p * sk_p * 4)
    # 11 MB, not the 16 MB scoped-vmem limit: Mosaic's measured stack need
    # runs ~1.3x this estimate (the bwd's 14.0 MB estimate allocated 18.0 MB
    # on v5e and failed compile), so the budget keeps actual <= ~14 MB.
    fits = blocks <= 11 * 1024 * 1024
    if mode == "1":
        return fits
    return fits and sq_p <= 256


def _bwd_bias_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, bias_ref,
                     do_ref, o_ref, dq_ref, dk_ref, dv_ref, dbias_ref, *,
                     scale, causal, sq, sk, bq, thr32, keep_inv, nbatch):
    i = pl.program_id(0)
    q = q_ref[0]                         # (sq_p, D)
    k = k_ref[0]                         # (sk_p, D)
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    kv_mask = mask_ref[0, 0]
    sq_p, sk_p = q.shape[0], k.shape[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0].astype(jnp.float32)
    logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(q_idx + (sk - sq) >= k_idx, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)    # (sq_p, sk_p) f32

    if thr32 is not None:
        # regenerate the forward's masks block-by-block (same seeds/shapes)
        blocks = [
            _gen_keep_factor(seed_ref[0], seed_ref[1], i, j, (bq, sk_p),
                             thr32, keep_inv)
            for j in range(sq_p // bq)
        ]
        mfac = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 0)
        p_drop = p * mfac
    else:
        p_drop = p

    dv_ref[0] = jax.lax.dot_general(
        p_drop.astype(q.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if thr32 is not None:
        dp = dp * mfac
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dlogits = p * (dp - delta)                    # (sq_p, sk_p) f32

    bi = i % nbatch

    @pl.when(bi == 0)
    def _init():
        dbias_ref[0] = dlogits.astype(dbias_ref.dtype)

    @pl.when(bi != 0)
    def _acc():
        dbias_ref[0] += dlogits.astype(dbias_ref.dtype)

    ds = (dlogits * scale).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _bias_dims(q, k, bias, nbatch):
    """Common padding/shapes for the bias kernels. q/k: (HB, S, D)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    bq = _pick_bq(sq)
    q_p = _pad_to(q, 1, bq)
    k_p = _pad_to(k, 1, 128)
    bias_p = _pad_to(_pad_to(bias, 1, bq), 2, 128)   # (H, sq_p, sk_p)
    return bh, sq, sk, d, bq, q_p, k_p, bias_p


def _fwd_bias(q, k, v, kv_mask, bias, seed, scale, causal, thr32, keep_inv,
              interpret, nbatch):
    bh, sq, sk, d, bq, q_p, k_p, bias_p = _bias_dims(q, k, bias, nbatch)
    v_p = _pad_to(v, 1, 128)
    mask_p = _pad_to(kv_mask, 1, 128, value=0)[:, None, :]
    sq_p, sk_p = q_p.shape[1], k_p.shape[1]

    if _fwd_bias_batched_ok(sq_p, sk_p, d, nbatch):
        nh = bias_p.shape[0]
        b_spec = lambda s: pl.BlockSpec((nbatch, s, d), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_fwd_bias_kernel_batched, scale=scale,
                              causal=causal, sq=sq, sk=sk, bq=bq,
                              thr32=thr32, keep_inv=keep_inv,
                              nbatch=nbatch),
            out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            grid=(nh,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                b_spec(sq_p), b_spec(sk_p), b_spec(sk_p),
                pl.BlockSpec((nbatch, 1, sk_p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sq_p, sk_p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=b_spec(sq_p),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq_p * sk_p * d,
                bytes_accessed=(q_p.size + 2 * k_p.size) * q.dtype.itemsize
                + bias_p.size * bias_p.dtype.itemsize,
                transcendentals=bh * sq_p * sk_p,
            ),
            interpret=interpret,
        )(seed, q_p, k_p, v_p, mask_p, bias_p)
        return out[:, :sq]

    kernel = functools.partial(_fwd_bias_kernel, scale=scale, causal=causal,
                               sq=sq, sk=sk, bq=bq, thr32=thr32,
                               keep_inv=keep_inv)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        grid=(bh, sq_p // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # batch-shared bias: revisited by B consecutive programs
            pl.BlockSpec((1, bq, sk_p), lambda i, j: (i // nbatch, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * sk_p * d,
            bytes_accessed=(q_p.size + 2 * k_p.size) * q.dtype.itemsize
            + bias_p.size * bias_p.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(seed, q_p, k_p, v_p, mask_p, bias_p)
    return out[:, :sq]


def _bwd_bias_kernel_batched(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                             bias_ref, do_ref, o_ref, dq_ref, dk_ref,
                             dv_ref, dbias_ref, *, scale, causal, sq, sk,
                             bq, thr32, keep_inv, nbatch):
    """Batched bias backward: grid (H,), one program per head, the batch
    loop unrolled IN-KERNEL.

    The row-serial `_bwd_bias_kernel` accumulates dbias across the B
    consecutive programs sharing a head, which forces the whole grid to
    "arbitrary" (serialized) dimension semantics — at the T5 decoder
    shapes (sq 128, 16x12 programs of tiny work) the serialization is the
    measured 1.35-3.2x loss vs XLA (VERDICT r4 weak #2). Here each of the
    H programs owns its dbias block privately, the grid is parallel, and
    K/V/bias are fetched once per head instead of once per (b, h).
    Dropout masks regenerate from the same per-(forward-program, block)
    seeds, so fwd/bwd masks stay bit-identical."""
    h = pl.program_id(0)
    bias = bias_ref[0].astype(jnp.float32)
    sq_p, sk_p = bias.shape
    dbias_acc = jnp.zeros_like(bias)
    for b in range(nbatch):
        q = q_ref[b]
        k = k_ref[b]
        v = v_ref[b]
        do = do_ref[b]
        o = o_ref[b]
        kv_mask = mask_ref[b, 0]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
        if causal:
            q_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(q_idx + (sk - sq) >= k_idx, logits, NEG_INF)

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        if thr32 is not None:
            # the forward ran as program i = h*nbatch + b over sq blocks j
            blocks = [
                _gen_keep_factor(seed_ref[0], seed_ref[1],
                                 h * nbatch + b, j, (bq, sk_p), thr32,
                                 keep_inv)
                for j in range(sq_p // bq)
            ]
            mfac = blocks[0] if len(blocks) == 1 else jnp.concatenate(
                blocks, 0)
            p_drop = p * mfac
        else:
            p_drop = p

        dv_ref[b] = jax.lax.dot_general(
            p_drop.astype(q.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if thr32 is not None:
            dp = dp * mfac
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        dlogits = p * (dp - delta)
        dbias_acc = dbias_acc + dlogits

        ds = (dlogits * scale).astype(q.dtype)
        dq_ref[b] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[b] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dbias_ref[0] = dbias_acc.astype(dbias_ref.dtype)


def _bwd_bias_batched_ok(sq_p: int, sk_p: int, d: int, nbatch: int) -> bool:
    """Dispatch envelope for the batched backward: the whole head's batch
    must fit VMEM. 4 q-sized + 4 k-sized bf16 blocks + bias/dbias fp32 +
    ~4 fp32 (sq_p, sk_p) transients, against a ~14 MB budget."""
    mode = os.environ.get("MMGL_BIAS_BWD_BATCHED", "auto")
    if mode == "0":
        return False
    blocks = (4 * nbatch * sq_p * d * 2 + 4 * nbatch * sk_p * d * 2
              + 2 * sq_p * sk_p * 4 + 4 * sq_p * sk_p * 4)
    # 11 MB, not 16: at the encoder 512x512 shape this estimate said
    # 14.0 MB but Mosaic allocated 18.0 MB of scoped vmem and failed
    # compile (~1.3x stack overhead) — the budget keeps actual <= ~14 MB.
    fits = blocks <= 11 * 1024 * 1024
    if mode == "1":
        return fits
    # auto: the serialized-grid penalty dominates at short query blocks;
    # long-query shapes (encoder 512) keep the row-serial kernel that
    # measured 2.47-5.96x over XLA in r4
    return fits and sq_p <= 256


def _bwd_bias_batched(q_p, k_p, v_p, mask_p, bias_p, seed, scale, causal,
                      thr32, keep_inv, interpret, nbatch, o_p, do_p,
                      sq, sk, bq):
    bh, sq_p, d = q_p.shape
    sk_p = k_p.shape[1]
    nh = bias_p.shape[0]
    b_spec = lambda s: pl.BlockSpec((nbatch, s, d), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, sq_p, sk_p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_bias_kernel_batched, scale=scale,
                               causal=causal, sq=sq, sk=sk, bq=bq,
                               thr32=thr32, keep_inv=keep_inv, nbatch=nbatch)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q_p.shape, q_p.dtype),
            jax.ShapeDtypeStruct(k_p.shape, k_p.dtype),
            jax.ShapeDtypeStruct(v_p.shape, v_p.dtype),
            jax.ShapeDtypeStruct((nh, sq_p, sk_p), jnp.float32),
        ),
        grid=(nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            b_spec(sq_p), b_spec(sk_p), b_spec(sk_p),
            pl.BlockSpec((nbatch, 1, sk_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec, b_spec(sq_p), b_spec(sq_p),
        ],
        out_specs=(b_spec(sq_p), b_spec(sk_p), b_spec(sk_p), bias_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq_p * sk_p * d,
            bytes_accessed=3 * (q_p.size + 2 * k_p.size)
            * q_p.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(seed, q_p, k_p, v_p, mask_p, bias_p, do_p, o_p)


def _bwd_bias(q, k, v, kv_mask, bias, seed, scale, causal, thr32, keep_inv,
              interpret, nbatch, out, dout):
    bh, sq, sk, d, bq, q_p, k_p, bias_p = _bias_dims(q, k, bias, nbatch)
    v_p = _pad_to(v, 1, 128)
    o_p = _pad_to(out, 1, bq)
    do_p = _pad_to(dout, 1, bq)
    mask_p = _pad_to(kv_mask, 1, 128, value=0)[:, None, :]
    sq_p, sk_p = q_p.shape[1], k_p.shape[1]
    nh = bias_p.shape[0]

    if _bwd_bias_batched_ok(sq_p, sk_p, d, nbatch):
        dq, dk, dv, dbias = _bwd_bias_batched(
            q_p, k_p, v_p, mask_p, bias_p, seed, scale, causal, thr32,
            keep_inv, interpret, nbatch, o_p, do_p, sq, sk, bq)
        return (dq[:, :sq], dk[:, :sk], dv[:, :sk],
                dbias[:, :sq, :sk].astype(bias.dtype))

    q_spec = pl.BlockSpec((1, sq_p, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, sk_p, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, sq_p, sk_p), lambda i: (i // nbatch, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_bias_kernel, scale=scale, causal=causal,
                               sq=sq, sk=sk, bq=bq, thr32=thr32,
                               keep_inv=keep_inv, nbatch=nbatch)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q_p.shape, q.dtype),
            jax.ShapeDtypeStruct(k_p.shape, k.dtype),
            jax.ShapeDtypeStruct(v_p.shape, v.dtype),
            jax.ShapeDtypeStruct((nh, sq_p, sk_p), jnp.float32),
        ),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec, k_spec, k_spec,
            pl.BlockSpec((1, 1, sk_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec, q_spec, q_spec,
        ],
        out_specs=(q_spec, k_spec, k_spec, bias_spec),
        # dbias accumulates across the B consecutive programs that share a
        # head: the grid must run in order (single-core v5e serializes
        # anyway; on megacore parts this forgoes cross-core grid splitting)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq_p * sk_p * d,
            bytes_accessed=3 * (q_p.size + 2 * k_p.size) * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(seed, q_p, k_p, v_p, mask_p, bias_p, do_p, o_p)
    return (dq[:, :sq], dk[:, :sk], dv[:, :sk],
            dbias[:, :sq, :sk].astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash_bias(q, k, v, kv_mask, bias, seed, scale, causal, thr32,
                keep_inv, interpret, nbatch):
    return _fwd_bias(q, k, v, kv_mask, bias, seed, scale, causal, thr32,
                     keep_inv, interpret, nbatch)


def _flash_bias_fwd(q, k, v, kv_mask, bias, seed, scale, causal, thr32,
                    keep_inv, interpret, nbatch):
    out = _fwd_bias(q, k, v, kv_mask, bias, seed, scale, causal, thr32,
                    keep_inv, interpret, nbatch)
    return out, (q, k, v, kv_mask, bias, seed, out)


def _flash_bias_bwd(scale, causal, thr32, keep_inv, interpret, nbatch, res,
                    dout):
    q, k, v, kv_mask, bias, seed, out = res
    dq, dk, dv, dbias = _bwd_bias(q, k, v, kv_mask, bias, seed, scale,
                                  causal, thr32, keep_inv, interpret, nbatch,
                                  out, dout)
    return dq, dk, dv, None, dbias, None


_flash_bias.defvjp(_flash_bias_fwd, _flash_bias_bwd)


def flash_attention_bias(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention with batch-shared additive bias and prob-dropout.

    bias: (1, H or 1, Sq, Sk) additive logits bias (T5 relative positions),
    shared across the batch. dropout is applied to the softmax probabilities
    inside the kernel (TPU hardware PRNG; see the bias-variant comment)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    if k.shape[2] == 1 and h > 1:
        k = jnp.broadcast_to(k, (b, sk, h, d))
        v = jnp.broadcast_to(v, (b, sk, h, v.shape[-1]))
    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), dtype=jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32)

    if bias is None:
        bias = jnp.zeros((h, sq, sk), q.dtype)   # dropout-only callers
    else:
        assert bias.ndim == 4 and bias.shape[0] == 1, (
            "bias kernel expects a batch-shared (1, H, Sq, Sk) bias")
        bias = bias[0]
        if bias.shape[0] == 1 and h > 1:
            bias = jnp.broadcast_to(bias, (h,) + bias.shape[1:])

    thr32, keep_inv = None, 1.0
    if dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        t = int(round(keep * 2.0 ** 32))
        if t < 2 ** 32:                 # else keep rounds to 1.0: no-op
            thr32, keep_inv = t, 1.0 / keep
    if thr32 is not None:
        assert dropout_rng is not None, "dropout needs an rng"
        seed = _dropout_seed(dropout_rng)
    else:
        seed = jnp.zeros((2,), jnp.int32)

    # HEAD-major flatten: program i = h*B + b shares its bias block with the
    # B-1 neighboring programs (fetched once per head, not once per (b,h))
    qf = q.transpose(2, 0, 1, 3).reshape(h * b, sq, d)
    kf = k.transpose(2, 0, 1, 3).reshape(h * b, sk, d)
    vf = v.transpose(2, 0, 1, 3).reshape(h * b, sk, d)
    maskf = jnp.tile(kv_mask, (h, 1))

    out = _flash_bias(qf, kf, vf, maskf, bias, seed, float(scale),
                      bool(causal), thr32, float(keep_inv), bool(interpret),
                      b)
    return out.reshape(h, b, sq, d).transpose(1, 2, 0, 3)


# ---------------------------------------------------------------------------
# fused-heads variant: lane-misaligned short sequences (CLIP towers)
# ---------------------------------------------------------------------------
#
# The CLIP vision tower's 197-patch attention (b=192 images per uncached
# step, h=12, d=64) is lane-misaligned, and the per-(b,h) kernel at the
# padded 256 shape is fetch-bound: grid (2304, 1) re-fetches K/V per head
# for ~8 MFLOP of work each. This kernel instead runs ONE program per
# sequence (grid (B,)) with q/k/v laid out (B, SP, H*D): the whole padded
# sequence stays VMEM-resident and a Python-unrolled loop computes every
# head back to back — 12x fewer block fetches. Measured on v5e at the
# production 197-patch shape: 0.400 ms vs 1.489 XLA / 3.204 per-(b,h)
# Pallas (scripts/tune_vision_attention.py, 3.72x). Also serves the CLIP
# text tower's 77-token causal attention (same misalignment).
#
# Forward-only by design — the towers are frozen (fusion.py stop_gradient);
# the custom VJP recomputes gradients through the XLA path for safety if
# anyone ever unfreezes them.


def _fused_heads_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
                        causal, s, nheads, d):
    kv_mask = mask_ref[0, 0]                       # (SP,)
    for h in range(nheads):
        q = q_ref[0, :, h * d:(h + 1) * d]         # (SP, D)
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
        if causal:
            q_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(q_idx >= k_idx, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fused_heads_fwd(q, k, v, kv_mask, scale, causal, interpret):
    """q/k/v: (B, S, H, D) BSHD with S == Sk (self-attention)."""
    b, s, h, d = q.shape
    q2 = _pad_to(q.reshape(b, s, h * d), 1, 128)
    k2 = _pad_to(k.reshape(b, s, h * d), 1, 128)
    v2 = _pad_to(v.reshape(b, s, h * d), 1, 128)
    mask_p = _pad_to(kv_mask, 1, 128, value=0)[:, None, :]
    sp = q2.shape[1]
    spec = pl.BlockSpec((1, sp, h * d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_heads_kernel, scale=scale, causal=causal,
                          s=s, nheads=h, d=d),
        out_shape=jax.ShapeDtypeStruct(q2.shape, q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, sp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sp * sp * h * d,
            bytes_accessed=4 * q2.size * q.dtype.itemsize,
            transcendentals=b * sp * sp * h,
        ),
        interpret=interpret,
    )(q2, k2, v2, mask_p)
    return out[:, :s].reshape(b, s, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_heads(q, k, v, kv_mask, scale, causal, interpret):
    return _fused_heads_fwd(q, k, v, kv_mask, scale, causal, interpret)


def _fused_heads_ref(q, k, v, kv_mask, scale, causal):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kv_mask[:, None, None, :] > 0, logits, NEG_INF)
    if causal:
        s = q.shape[1]
        idx = jnp.arange(s)
        logits = jnp.where((idx[:, None] >= idx[None, :])[None, None],
                           logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _fused_heads_vjp_fwd(q, k, v, kv_mask, scale, causal, interpret):
    return (_fused_heads_fwd(q, k, v, kv_mask, scale, causal, interpret),
            (q, k, v, kv_mask))


def _fused_heads_vjp_bwd(scale, causal, interpret, res, dout):
    # towers are frozen in every production config; this exists so an
    # unfrozen tower still trains correctly (XLA recompute, no kernel)
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(
        lambda q, k, v: _fused_heads_ref(q, k, v, kv_mask, scale, causal),
        q, k, v)
    dq, dk, dv = vjp(dout)
    return dq, dk, dv, None


_fused_heads.defvjp(_fused_heads_vjp_fwd, _fused_heads_vjp_bwd)


def fused_heads_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """One-program-per-sequence fused attention (see comment above)."""
    b, s, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), dtype=jnp.int32)
    return _fused_heads(q, k, v, kv_mask.astype(jnp.int32), float(scale),
                        bool(causal), bool(interpret))


# ---------------------------------------------------------------------------
# allheads variant: transpose-free layout for the LM's aligned self-attention
# ---------------------------------------------------------------------------
#
# The captured cached-step trace (PARITY.md r4) shows ~17 ms/step of layout
# copies, dominated by the BSHD -> (B*H, S, D) physical transposes that
# bracket every per-(b,h) attention custom-call. This schedule instead takes
# q/k/v in the (B, S, H*D) layout the QKV projections ALREADY produce
# (reshape from BSHD is free — same physical bytes): grid (B, H/HP), block
# (1, S, HP*D) — a contiguous column slice, no transpose anywhere. HP=2 at
# D=64 makes the slice a full 128-lane tile and keeps the working set
# (5 in + 3 out blocks + per-head fp32 (S,S) temporaries) inside the ~16 MB
# VMEM envelope at S=640. Forward AND backward are Pallas (same delta-based
# math as _bwd_kernel, per head).
#
# Routed only where MEASURED faster (scripts/tune_attention_allheads.py);
# like the blocked backward, it stays selectable + parity-tested otherwise.


def _allheads_kernel_fwd(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
                         causal, sq, sk, hp, d):
    kv_mask = mask_ref[0, 0]
    for h in range(hp):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(qi + (sk - sq) >= ki, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _allheads_kernel_bwd(q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref,
                         dq_ref, dk_ref, dv_ref, *, scale, causal, sq, sk,
                         hp, d):
    kv_mask = mask_ref[0, 0]
    for h in range(hp):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        o = o_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(qi + (sk - sq) >= ki, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p_n = p.astype(q.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p_n, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _allheads_hp(d: int) -> int:
    return 2 if d * 2 <= 128 else 1


def _allheads_specs(s, hp, d):
    blk = pl.BlockSpec((1, s, hp * d), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return blk, mask


def _allheads_fwd(q2, k2, v2, kv_mask, scale, causal, interpret, h, d):
    b, sq, _ = q2.shape
    sk = k2.shape[1]
    hp = _allheads_hp(d)
    blk, mask_spec = _allheads_specs(sq, hp, d)
    kblk, _ = _allheads_specs(sk, hp, d)
    return pl.pallas_call(
        functools.partial(_allheads_kernel_fwd, scale=scale, causal=causal,
                          sq=sq, sk=sk, hp=hp, d=d),
        out_shape=jax.ShapeDtypeStruct(q2.shape, q2.dtype),
        grid=(b, h // hp),
        in_specs=[blk, kblk, kblk, mask_spec],
        out_specs=blk,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * h * d,
            bytes_accessed=4 * q2.size * q2.dtype.itemsize,
            transcendentals=b * sq * sk * h),
        interpret=interpret,
    )(q2, k2, v2, kv_mask[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _allheads(q2, k2, v2, kv_mask, scale, causal, interpret, h, d):
    return _allheads_fwd(q2, k2, v2, kv_mask, scale, causal, interpret, h, d)


def _allheads_vjp_fwd(q2, k2, v2, kv_mask, scale, causal, interpret, h, d):
    out = _allheads_fwd(q2, k2, v2, kv_mask, scale, causal, interpret, h, d)
    return out, (q2, k2, v2, kv_mask, out)


def _allheads_vjp_bwd(scale, causal, interpret, h, d, res, dout):
    q2, k2, v2, kv_mask, out = res
    b, sq, _ = q2.shape
    sk = k2.shape[1]
    hp = _allheads_hp(d)
    blk, mask_spec = _allheads_specs(sq, hp, d)
    kblk, _ = _allheads_specs(sk, hp, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_allheads_kernel_bwd, scale=scale, causal=causal,
                          sq=sq, sk=sk, hp=hp, d=d),
        out_shape=(jax.ShapeDtypeStruct(q2.shape, q2.dtype),
                   jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                   jax.ShapeDtypeStruct(v2.shape, v2.dtype)),
        grid=(b, h // hp),
        in_specs=[blk, kblk, kblk, mask_spec, blk, blk],
        out_specs=(blk, kblk, kblk),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * sq * sk * h * d,
            bytes_accessed=8 * q2.size * q2.dtype.itemsize,
            transcendentals=b * sq * sk * h),
        interpret=interpret,
    )(q2, k2, v2, kv_mask[:, None, :], dout, out)
    return dq, dk, dv, None


_allheads.defvjp(_allheads_vjp_fwd, _allheads_vjp_bwd)


def flash_attention_allheads(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Transpose-free fused attention over BSHD tensors (aligned S only)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    assert sq % 128 == 0 and sk % 128 == 0, "allheads needs lane-aligned S"
    assert h % _allheads_hp(d) == 0
    if scale is None:
        scale = d ** -0.5
    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), dtype=jnp.int32)
    out = _allheads(q.reshape(b, sq, h * d), k.reshape(b, sk, h * d),
                    v.reshape(b, sk, h * d), kv_mask.astype(jnp.int32),
                    float(scale), bool(causal), bool(interpret), h, d)
    return out.reshape(b, sq, h, d)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention over BSHD tensors (see module docstring for envelope)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    if k.shape[2] == 1 and h > 1:
        k = jnp.broadcast_to(k, (b, sk, h, d))
        v = jnp.broadcast_to(v, (b, sk, h, v.shape[-1]))
    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), dtype=jnp.int32)
    kv_mask = kv_mask.astype(jnp.int32)

    # BSHD -> (B*H, S, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    maskf = jnp.repeat(kv_mask, h, axis=0)

    out = _flash(qf, kf, vf, maskf, float(scale), bool(causal), bool(interpret))
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
