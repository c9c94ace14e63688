"""Loss functions.

Reproduces the reference's loss semantics:
  * decoder-only: shifted CE over the whole sequence — including prompt and
    pad tokens, SURVEY Q10 — with -100 positions (neighbor soft tokens, image
    splices) excluded (modelling_cross_attention.py:826-836 and HF OPT).
  * encoder-decoder: CE over summary labels, 0/pad masked to -100
    (data.py:284).
  * summary_loss: the decoder-only logging metric restricted to the label
    span with pad ignored (run_generation.py:470-481).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = -100


@jax.custom_vjp
def _ce_core(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-token CE in fp32 from native-dtype logits; labels < 0 -> 0.

    Why custom VJP: under plain autodiff the fp32 upcast of the (B, T, V)
    logits becomes a materialized residual — profiled at 11.5 ms/step for
    a 4.1 GB f32[32,639,50272] write on v5e (scripts/profile_step.py,
    BENCH r3). Here the only saved tensor is the bf16 matmul output that
    already exists, plus the (B, T) logsumexp; the backward recomputes
    softmax from bf16 fused with the one-hot subtraction in one
    elementwise pass. Math is unchanged — the upcast never added
    information, the logits were bf16 coming out of the LM head.
    """
    ce, _ = _ce_core_fwd(logits, labels)
    return ce


def _ce_core_fwd(logits, labels):
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    # max over the native dtype is exact (convert is monotonic); only the
    # exp/sum runs in fp32, with the convert fused into the reduction
    m = jnp.max(logits, axis=-1)
    mf = m.astype(jnp.float32)
    s = jnp.sum(jnp.exp(logits.astype(jnp.float32) - mf[..., None]), axis=-1)
    logz = jnp.log(s) + mf
    gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, logz - gold.astype(jnp.float32), 0.0)
    return ce, (logits, safe, valid, logz)


def _ce_core_bwd(res, g):
    logits, safe, valid, logz = res
    gf = jnp.where(valid, g, 0.0).astype(jnp.float32)
    p = jnp.exp(logits.astype(jnp.float32) - logz[..., None])
    eq = jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, logits.ndim - 1) == safe[..., None]
    dlogits = ((p - eq.astype(jnp.float32)) * gf[..., None]).astype(
        logits.dtype)
    return dlogits, np.zeros(safe.shape, dtype=jax.dtypes.float0)


_ce_core.defvjp(_ce_core_fwd, _ce_core_bwd)


def _ce_plain(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-token CE via plain autodiff (no custom VJP).

    Identical math to _ce_core; exists for memory-constrained billion-param
    configs where pinning the bf16 logits as a VJP residual costs more HBM
    than XLA's own remat of the head matmul would (fused_ce=False)."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logits32 = logits.astype(jnp.float32)
    logz = jax.scipy.special.logsumexp(logits32, axis=-1)
    gold = jnp.take_along_axis(logits32, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, logz - gold, 0.0)


def _token_ce(logits: jax.Array, labels: jax.Array,
              fused: bool = True) -> jax.Array:
    """Per-token CE in fp32; labels < 0 produce 0 with 0 weight."""
    core = _ce_core if fused else _ce_plain
    return core(logits, labels), labels >= 0


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted CE: logits[:, :-1] predict labels[:, 1:]."""
    ce, valid = _token_ce(logits[:, :-1], labels[:, 1:])
    return ce.sum() / jnp.maximum(valid.sum(), 1)


def seq2seq_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Unshifted CE (decoder inputs already shifted right)."""
    ce, valid = _token_ce(logits, labels)
    return ce.sum() / jnp.maximum(valid.sum(), 1)


def causal_losses(logits: jax.Array, labels: jax.Array,
                  max_input_length: int, pad_token_id: int,
                  fused_ce: bool = True):
    """(lm_loss, summary_loss) from ONE per-token CE pass.

    summary_loss is the same shifted CE restricted to label-span positions
    with pads dropped (run_generation.py:470-481) — recomputing the
    full-vocab logsumexp for it (as calling causal_lm_loss + summary_loss
    separately does) doubles the most bandwidth-hungry op in the step.
    """
    ce, valid = _token_ce(logits[:, :-1], labels[:, 1:], fused=fused_ce)
    loss = ce.sum() / jnp.maximum(valid.sum(), 1)
    pos = jnp.arange(ce.shape[1])
    shifted = labels[:, 1:]
    span = valid & (pos[None, :] >= max_input_length) \
        & (shifted != pad_token_id)
    s_loss = (ce * span).sum() / jnp.maximum(span.sum(), 1)
    return loss, s_loss


def _pad_vocab(emb: jax.Array, n_chunks: int):
    v, d = emb.shape
    vc = -(-v // n_chunks)
    vc += (-vc) % 128          # lane-aligned chunk width
    vpad = n_chunks * vc
    if vpad != v:
        emb = jnp.pad(emb, ((0, vpad - v), (0, 0)))
    return emb.reshape(n_chunks, vc, d), vc


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def chunked_ce(hidden: jax.Array, emb: jax.Array, labels: jax.Array,
               n_chunks: int = 8) -> jax.Array:
    """Per-token CE with the LM head folded in, streamed over vocab chunks.

    Computes CE(hidden @ emb.T, labels) WITHOUT ever materializing the full
    (B, T, V) logits or dlogits in HBM: a lax.scan over V/n_chunks-wide
    slices of the head keeps the live tensor at 1/n_chunks of the logits
    (online logsumexp accumulation, flash-attention-style). The backward
    recomputes each chunk's logits (one extra vocab matmul vs the
    materialized path) and accumulates dhidden/demb per chunk.

    Trade: +1 vocab matmul of FLOPs against -(B,T,V) residual memory and
    the full dlogits round-trip. Measured A/B (scripts/ab_ce.py) decides
    dispatch; target: the 8.2 ms softmax/dlogits elementwise traffic in the
    r4 trace's CE cluster (VERDICT r4 item 7), and the memory headroom for
    OPT-6.7B where pinning bf16 logits costs 2 GB+.

    hidden: (B, T, D); emb: (V, D) tied head; labels: (B, T), < 0 ignored.
    """
    ce, _ = _chunked_ce_fwd(hidden, emb, labels, n_chunks)
    return ce


def _chunked_ce_fwd(hidden, emb, labels, n_chunks):
    v = emb.shape[0]
    embc, vc = _pad_vocab(emb, n_chunks)
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    bt = hidden.shape[:-1]

    def body(carry, xs):
        m, s, gold = carry
        c, emb_c = xs
        logits_c = jax.lax.dot_general(
            hidden, emb_c, (((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (B, T, vc) f32
        base = c * vc
        vocab_idx = jax.lax.broadcasted_iota(jnp.int32, logits_c.shape,
                                             logits_c.ndim - 1) + base
        logits_c = jnp.where(vocab_idx < v, logits_c, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(logits_c, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits_c - m_new[..., None]), axis=-1)
        in_chunk = (safe >= base) & (safe < base + vc)
        idx = jnp.clip(safe - base, 0, vc - 1)
        g = jnp.take_along_axis(logits_c, idx[..., None], axis=-1)[..., 0]
        gold = gold + jnp.where(in_chunk, g, 0.0)
        return (m_new, s, gold), None

    init = (jnp.full(bt, -jnp.inf, jnp.float32),
            jnp.zeros(bt, jnp.float32), jnp.zeros(bt, jnp.float32))
    (m, s, gold), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), embc))
    logz = jnp.log(s) + m
    ce = jnp.where(valid, logz - gold, 0.0)
    return ce, (hidden, emb, safe, valid, logz)


def _chunked_ce_bwd(n_chunks, res, g):
    hidden, emb, safe, valid, logz = res
    v = emb.shape[0]
    embc, vc = _pad_vocab(emb, n_chunks)
    gf = jnp.where(valid, g, 0.0).astype(jnp.float32)

    def body(dh, xs):
        c, emb_c = xs
        logits_c = jax.lax.dot_general(
            hidden, emb_c, (((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        base = c * vc
        vocab_idx = jax.lax.broadcasted_iota(jnp.int32, logits_c.shape,
                                             logits_c.ndim - 1) + base
        p = jnp.where(vocab_idx < v,
                      jnp.exp(logits_c - logz[..., None]), 0.0)
        eq = vocab_idx == safe[..., None]
        dlog = ((p - eq.astype(jnp.float32))
                * gf[..., None]).astype(hidden.dtype)  # (B, T, vc)
        dh = dh + jax.lax.dot_general(
            dlog, emb_c, (((dlog.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # demb_c = sum over (B, T) of dlog^T hidden -> (vc, D)
        bt_axes = tuple(range(dlog.ndim - 1))
        demb_c = jax.lax.dot_general(
            dlog, hidden, ((bt_axes, bt_axes), ((), ())),
            preferred_element_type=jnp.float32)
        return dh, demb_c

    dh0 = jnp.zeros(hidden.shape, jnp.float32)
    dh, demb = jax.lax.scan(body, dh0, (jnp.arange(n_chunks), embc))
    demb = demb.reshape(n_chunks * vc, emb.shape[1])[:v]
    return (dh.astype(hidden.dtype), demb.astype(emb.dtype),
            np.zeros(safe.shape, dtype=jax.dtypes.float0))


chunked_ce.defvjp(_chunked_ce_fwd, _chunked_ce_bwd)


def chunked_causal_losses(hidden: jax.Array, emb: jax.Array,
                          labels: jax.Array, max_input_length: int,
                          pad_token_id: int, n_chunks: int = 8):
    """(lm_loss, summary_loss) like causal_losses, but head-fused/chunked:
    consumes pre-head hidden states + the tied embedding instead of logits."""
    ce = chunked_ce(hidden[:, :-1], emb, labels[:, 1:], n_chunks)
    valid = labels[:, 1:] >= 0
    loss = ce.sum() / jnp.maximum(valid.sum(), 1)
    pos = jnp.arange(ce.shape[1])
    shifted = labels[:, 1:]
    span = valid & (pos[None, :] >= max_input_length) \
        & (shifted != pad_token_id)
    s_loss = (ce * span).sum() / jnp.maximum(span.sum(), 1)
    return loss, s_loss


def summary_loss(logits: jax.Array, labels: jax.Array, max_input_length: int,
                 pad_token_id: int) -> jax.Array:
    """Decoder-only logging loss over the label span only
    (run_generation.py:470-481): logits[max_input:-1] vs
    labels[max_input+1:], pads ignored."""
    shift_logits = logits[:, max_input_length:-1]
    shift_labels = labels[:, max_input_length + 1:]
    diff = shift_logits.shape[1] - shift_labels.shape[1]
    if diff > 0:
        shift_logits = shift_logits[:, :-diff]
    masked = jnp.where(shift_labels == pad_token_id, IGNORE_INDEX, shift_labels)
    ce, valid = _token_ce(shift_logits, masked)
    return ce.sum() / jnp.maximum(valid.sum(), 1)
