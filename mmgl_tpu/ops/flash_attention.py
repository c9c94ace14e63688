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
