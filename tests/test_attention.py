"""Pallas fused attention vs XLA reference attention (fwd + grad).

Runs the kernels in interpreter mode on CPU (the same code path compiles on
TPU; bench.py exercises the compiled kernels on the real chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgl_tpu.ops.attention import xla_attention
from mmgl_tpu.ops.flash_attention import flash_attention


def _rand(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


def _make_qkv(b=2, sq=64, sk=64, h=4, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = _rand(ks[0], b, sq, h, d)
    k = _rand(ks[1], b, sk, h, d)
    v = _rand(ks[2], b, sk, h, d)
    mask = (jax.random.uniform(ks[3], (b, sk)) > 0.2).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)  # never fully masked
    return q, k, v, mask


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_xla(causal):
    q, k, v, mask = _make_qkv()
    ref = xla_attention(q, k, v, kv_mask=mask, causal=causal)
    got = flash_attention(q, k, v, kv_mask=mask, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_forward_unpadded_lengths():
    # sq=50, sk=70 exercise the padding path
    q, k, v, mask = _make_qkv(b=1, sq=50, sk=70, h=2, d=16, seed=1)
    ref = xla_attention(q, k, v, kv_mask=mask, causal=False)
    got = flash_attention(q, k, v, kv_mask=mask, causal=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_cross_attention_shape():
    # neighbor cross-attention shape: long queries, 64 soft-token KV
    q, k, v, mask = _make_qkv(b=2, sq=96, sk=64, h=2, d=16, seed=2)
    ref = xla_attention(q, k, v, kv_mask=mask)
    got = flash_attention(q, k, v, kv_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_kv_cache_decode_alignment():
    # sq=1 single-step decode against sk=32 cache: causal must align ends
    q, k, v, _ = _make_qkv(b=1, sq=32, sk=32, h=2, d=16, seed=3)
    full = xla_attention(q, k, v, causal=True)
    last = flash_attention(q[:, -1:], k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(last[:, 0]), np.asarray(full[:, -1]),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_xla(causal):
    q, k, v, mask = _make_qkv(b=1, sq=32, sk=32, h=2, d=16, seed=4)

    def loss_ref(q, k, v):
        out = xla_attention(q, k, v, kv_mask=mask, causal=causal)
        return jnp.sum(out * jnp.cos(out))

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv_mask=mask, causal=causal,
                              interpret=True)
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    # tolerance = the measured f32 noise floor: against an f64 ground truth,
    # XLA autodiff and this kernel's VJP are each ~5e-3 off; they agree with
    # each other to the same level.
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-3)


def test_blocked_causal_backward_multiblock(monkeypatch):
    """The triangle-skipping blocked causal backward (MMGL_BLOCKED_BWD=1:
    grid over 128-row blocks, p recomputed from the saved logsumexp —
    measured slower than the dense default at 640 tokens, kept for longer
    sequences) vs XLA autodiff on shapes spanning several blocks, including
    the end-aligned sq < sk case — a wrong causal start/limit bound would
    skip a needed block here."""
    import mmgl_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_BLOCKED_BWD", True)
    for sq, sk, seed in ((300, 300, 7), (200, 328, 8)):
        q, k, v, mask = _make_qkv(b=1, sq=sq, sk=sk, h=2, d=16, seed=seed)

        def loss_ref(q, k, v):
            out = xla_attention(q, k, v, kv_mask=mask, causal=True)
            return jnp.sum(out * jnp.cos(out))

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, kv_mask=mask, causal=True,
                                  interpret=True)
            return jnp.sum(out * jnp.cos(out))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-2, atol=5e-3,
                                       err_msg=f"sq={sq} sk={sk}")


def test_fully_masked_rows_finite():
    q, k, v, _ = _make_qkv(b=1, sq=8, sk=8, h=1, d=8, seed=5)
    mask = jnp.zeros((1, 8), dtype=jnp.int32)
    out = flash_attention(q, k, v, kv_mask=mask, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_streaming_causal_kernel_matches_xla(monkeypatch):
    """The block-skipping streaming causal forward (env-selectable,
    MMGL_CAUSAL_STREAM=1) must match XLA exactly like the dense default."""
    import mmgl_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_CAUSAL_STREAM", True)
    # multi-block shapes so the causal limit actually skips chunks
    q, k, v, mask = _make_qkv(b=1, sq=300, sk=300, h=2, d=16, seed=6)
    ref = xla_attention(q, k, v, kv_mask=mask, causal=True)
    got = flash_attention(q, k, v, kv_mask=mask, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)

    # decode-style end alignment (sq < sk) through the streaming path too
    last = flash_attention(q[:, -36:], k, v, kv_mask=mask, causal=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(last), np.asarray(ref[:, -36:]),
                               rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# bias-variant kernel (T5 relative-position bias, VERDICT r3 item 1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
def test_bias_forward_matches_xla(causal):
    from mmgl_tpu.ops.flash_attention import flash_attention_bias

    q, k, v, mask = _make_qkv(b=3, sq=64, sk=64, h=4, d=32, seed=5)
    bias = _rand(jax.random.PRNGKey(9), 1, 4, 64, 64)
    ref = xla_attention(q, k, v, kv_mask=mask, bias=bias, causal=causal)
    got = flash_attention_bias(q, k, v, bias=bias, kv_mask=mask,
                               causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_bias_forward_unpadded_and_broadcast_head():
    from mmgl_tpu.ops.flash_attention import flash_attention_bias

    # t5-ish decoder cross shape with ragged lengths + single-head bias
    q, k, v, mask = _make_qkv(b=2, sq=50, sk=70, h=4, d=16, seed=6)
    bias = _rand(jax.random.PRNGKey(10), 1, 1, 50, 70)
    ref = xla_attention(q, k, v, kv_mask=mask, bias=bias)
    got = flash_attention_bias(q, k, v, bias=bias, kv_mask=mask,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_bias_gradients_match_xla(causal):
    """dq/dk/dv AND dbias (the rel-pos embedding's gradient path) against
    XLA autodiff; bias is batch-shared so dbias sums over batch."""
    from mmgl_tpu.ops.flash_attention import flash_attention_bias

    q, k, v, mask = _make_qkv(b=3, sq=32, sk=32, h=2, d=16, seed=7)
    bias = _rand(jax.random.PRNGKey(11), 1, 2, 32, 32)

    def loss_ref(q, k, v, bias):
        out = xla_attention(q, k, v, kv_mask=mask, bias=bias, causal=causal)
        return jnp.sum(out * jnp.cos(out))

    def loss_flash(q, k, v, bias):
        out = flash_attention_bias(q, k, v, bias=bias, kv_mask=mask,
                                   causal=causal, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-3)


def test_bias_kernel_multi_query_block_seeding():
    """sq large enough for >1 query block: the backward's per-block mask
    regeneration must tile exactly like the forward (no-dropout path here;
    the seeded path is chip-verified by scripts/verify_bias_kernel.py)."""
    from mmgl_tpu.ops.flash_attention import flash_attention_bias

    q, k, v, mask = _make_qkv(b=1, sq=256, sk=128, h=2, d=16, seed=8)
    bias = _rand(jax.random.PRNGKey(12), 1, 2, 256, 128)
    ref = xla_attention(q, k, v, kv_mask=mask, bias=bias, causal=True)
    got = flash_attention_bias(q, k, v, bias=bias, kv_mask=mask, causal=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# fused-heads kernel (lane-misaligned tower shapes, VERDICT r3 item 2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal,s", [(False, 197), (True, 77)])
def test_fused_heads_forward_matches_xla(causal, s):
    """The CLIP-tower shapes: 197 vision patches (bidirectional) and 77
    text tokens (causal) — both lane-misaligned."""
    from mmgl_tpu.ops.flash_attention import fused_heads_attention

    q, k, v, mask = _make_qkv(b=3, sq=s, sk=s, h=4, d=32, seed=13)
    ref = xla_attention(q, k, v, kv_mask=mask, causal=causal)
    got = fused_heads_attention(q, k, v, kv_mask=mask, causal=causal,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_fused_heads_gradient_fallback():
    """Towers are frozen in production, but the VJP (XLA recompute) must
    still give correct grads if one is unfrozen."""
    from mmgl_tpu.ops.flash_attention import fused_heads_attention

    q, k, v, mask = _make_qkv(b=2, sq=70, sk=70, h=2, d=16, seed=14)

    def loss_ref(q, k, v):
        out = xla_attention(q, k, v, kv_mask=mask)
        return jnp.sum(out * jnp.sin(out))

    def loss_fused(q, k, v):
        out = fused_heads_attention(q, k, v, kv_mask=mask, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-3)


def test_dispatch_routes_misaligned_self_attention_to_fused_heads(
        monkeypatch):
    """multi_head_attention must route the 197-patch self-attention to the
    fused-heads kernel when Pallas is requested."""
    from mmgl_tpu.ops import attention as att
    import mmgl_tpu.ops.flash_attention as fa

    called = {}
    orig = fa.fused_heads_attention

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "fused_heads_attention", spy)
    q, k, v, mask = _make_qkv(b=2, sq=197, sk=197, h=4, d=32, seed=15)
    out = att.multi_head_attention(q, k, v, kv_mask=mask, use_pallas=True,
                                   interpret=True)
    assert called.get("yes"), "fused-heads kernel was not dispatched"
    ref = xla_attention(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# allheads variant (transpose-free aligned self-attention)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
def test_allheads_matches_xla(causal):
    from mmgl_tpu.ops.flash_attention import flash_attention_allheads

    q, k, v, mask = _make_qkv(b=2, sq=128, sk=128, h=4, d=32, seed=21)
    ref = xla_attention(q, k, v, kv_mask=mask, causal=causal)
    got = flash_attention_allheads(q, k, v, kv_mask=mask, causal=causal,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_allheads_gradients_match_xla(causal):
    from mmgl_tpu.ops.flash_attention import flash_attention_allheads

    q, k, v, mask = _make_qkv(b=2, sq=128, sk=128, h=4, d=32, seed=22)

    def loss_ref(q, k, v):
        out = xla_attention(q, k, v, kv_mask=mask, causal=causal)
        return jnp.sum(out * jnp.cos(out))

    def loss_ah(q, k, v):
        out = flash_attention_allheads(q, k, v, kv_mask=mask, causal=causal,
                                       interpret=True)
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_ah, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-3)


def test_dispatch_routes_aligned_self_attention_to_allheads(monkeypatch):
    """Aligned (S%128==0) self-attention must take the transpose-free
    allheads schedule (measured 1.41x at the 640-causal LM shape)."""
    from mmgl_tpu.ops import attention as att
    import mmgl_tpu.ops.flash_attention as fa

    called = {}
    orig = fa.flash_attention_allheads

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention_allheads", spy)
    q, k, v, mask = _make_qkv(b=2, sq=128, sk=128, h=4, d=32, seed=23)
    out = att.multi_head_attention(q, k, v, kv_mask=mask, causal=True,
                                   use_pallas=True, interpret=True)
    assert called.get("yes"), "allheads kernel was not dispatched"
    ref = xla_attention(q, k, v, kv_mask=mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_dispatch_falls_back_past_allheads_envelope(monkeypatch):
    """Beyond the allheads VMEM envelope (S>768) the blocked per-(b,h)
    kernel must still be dispatched."""
    from mmgl_tpu.ops import attention as att
    import mmgl_tpu.ops.flash_attention as fa

    called = {}
    orig = fa.flash_attention

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention", spy)
    q, k, v, mask = _make_qkv(b=1, sq=896, sk=896, h=2, d=32, seed=24)
    out = att.multi_head_attention(q, k, v, kv_mask=mask, causal=True,
                                   use_pallas=True, interpret=True)
    assert called.get("yes"), "blocked kernel was not dispatched"
    ref = xla_attention(q, k, v, kv_mask=mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("causal,sq,sk", [(True, 128, 128), (False, 128, 256)])
def test_bias_backward_batched_matches_serial(monkeypatch, causal, sq, sk):
    """The batched bias backward (grid (H,), in-kernel batch loop — built
    for the T5 decoder 128-query shapes where the row-serial grid's
    dbias serialization loses to XLA) must produce the same gradients as
    the row-serial kernel, including dbias summed over batch."""
    from mmgl_tpu.ops import flash_attention as fa

    q, k, v, mask = _make_qkv(b=3, sq=sq, sk=sk, h=2, d=16, seed=21)
    bias = _rand(jax.random.PRNGKey(22), 1, 2, sq, sk)

    def loss(q, k, v, bias):
        out = fa.flash_attention_bias(q, k, v, bias=bias, kv_mask=mask,
                                      causal=causal, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    grads = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("MMGL_BIAS_BWD_BATCHED", mode)
        grads[mode] = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(grads["0"], grads["1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # and the batched path's dispatch envelope: the encoder 512 shape must
    # stay on the measured row-serial kernel in auto mode
    monkeypatch.delenv("MMGL_BIAS_BWD_BATCHED", raising=False)
    assert not fa._bwd_bias_batched_ok(512, 512, 64, 16)
    assert fa._bwd_bias_batched_ok(128, 128, 64, 16)
    assert fa._bwd_bias_batched_ok(128, 512, 64, 16)


@pytest.mark.parametrize("causal,sq,sk", [(True, 128, 128), (False, 128, 256)])
def test_bias_forward_batched_matches_per_bh(monkeypatch, causal, sq, sk):
    """The batched bias forward (grid (H,), in-kernel batch loop) must
    equal the per-(b,h) forward and the XLA reference."""
    from mmgl_tpu.ops import flash_attention as fa

    q, k, v, mask = _make_qkv(b=3, sq=sq, sk=sk, h=2, d=16, seed=31)
    bias = _rand(jax.random.PRNGKey(32), 1, 2, sq, sk)
    ref = xla_attention(q, k, v, kv_mask=mask, bias=bias, causal=causal)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("MMGL_BIAS_FWD_BATCHED", mode)
        outs[mode] = fa.flash_attention_bias(q, k, v, bias=bias,
                                             kv_mask=mask, causal=causal,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(outs["1"]), np.asarray(outs["0"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(outs["1"]), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
