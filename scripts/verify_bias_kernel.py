"""ON-CHIP verification of the Pallas bias(+dropout) attention kernel.

The interpret-mode tests (tests/test_attention.py) cover the bias math on
CPU; what only the real chip can verify is (a) the compiled lowering of the
bias kernels at the production t5-base shapes and (b) the in-kernel
hardware-PRNG dropout — interpret mode has no TPU PRNG, so the seeded
forward, the backward's bit-exact mask REGENERATION, and the custom-VJP
gradients under dropout are checked here.

Accuracy criterion (measured, r4): on TPU BOTH paths run their matmuls at
bf16 MXU precision even for f32 inputs — the compiled kernel and the XLA
einsum path each sit ~5e-2 (max-abs, relative to grad max) from an
f32-highest-precision reference at these shapes, so comparing them to each
other at 5e-2 is a coin flip. The honest check, per gradient tensor:

    err(pallas vs f32-truth)  <=  margin * err(xla-default vs f32-truth)

with truth = the XLA reference under jax.default_matmul_precision
("highest") on f32 inputs. margin 1.6 + a small absolute floor: the kernel
must be AS ACCURATE AS the path it replaces, which is what dispatching it
asserts.

Run:  python scripts/verify_bias_kernel.py
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mmgl_tpu.ops.attention import xla_attention  # noqa: E402
from mmgl_tpu.ops.flash_attention import (  # noqa: E402
    _dropout_seed, _gen_keep_factor, _pick_bq, flash_attention_bias)

MARGIN = 1.6
ABS_FLOOR = 3e-3   # of the grad's max element


def _mk(b, sq, sk, h, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, sk, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, sk, h, d), jnp.float32)
    mask = (jax.random.uniform(ks[3], (b, sk)) > 0.1).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)
    bias = jax.random.normal(ks[4], (1, h, sq, sk), jnp.float32)
    return q, k, v, mask, bias


def extract_keep_factors(rng, b, h, sq, sk, rate):
    """(H*B, sq_p, sk_p) keep-factor matrices, bit-identical to what the
    production kernel generates for this rng/shape."""
    keep = 1.0 - rate
    thr32 = int(round(keep * 2.0 ** 32))
    keep_inv = 1.0 / keep
    bq = _pick_bq(sq)
    sq_p = sq + (-sq) % bq
    sk_p = sk + (-sk) % 128
    seed = _dropout_seed(rng)

    def kern(seed_ref, o_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        o_ref[0] = _gen_keep_factor(seed_ref[0], seed_ref[1], i, j,
                                    (bq, sk_p), thr32, keep_inv)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h * b, sq_p, sk_p), jnp.float32),
        grid=(h * b, sq_p // bq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, bq, sk_p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(seed)


def xla_with_factor(q, k, v, mask, bias, factors, causal, sq, sk):
    """Reference attention applying EXPLICIT keep-factor matrices, in the
    kernel's head-major flattened space. Matmul dtype follows q's dtype."""
    b, _, h, d = q.shape
    qf = q.transpose(2, 0, 1, 3).reshape(h * b, sq, d)
    kf = k.transpose(2, 0, 1, 3).reshape(h * b, sk, d)
    vf = v.transpose(2, 0, 1, 3).reshape(h * b, sk, d)
    maskf = jnp.tile(mask, (h, 1))
    bias_hb = jnp.repeat(bias[0], b, axis=0)          # (H*B, sq, sk)
    logits = jnp.einsum("nqd,nkd->nqk", qf, kf,
                        preferred_element_type=jnp.float32) + bias_hb
    logits = jnp.where(maskf[:, None, :] > 0, logits, -1e30)
    if causal:
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        ki = jnp.arange(sk)[None, :]
        logits = jnp.where((qi >= ki)[None], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    p = p * factors[:, :sq, :sk]
    out = jnp.einsum("nqk,nkd->nqd", p.astype(vf.dtype), vf,
                     preferred_element_type=jnp.float32)
    return out.reshape(h, b, sq, d).transpose(1, 2, 0, 3).astype(q.dtype)


def relerr(got, truth):
    got = np.asarray(got, np.float32)
    truth = np.asarray(truth, np.float32)
    return float(np.max(np.abs(got - truth)) / max(np.abs(truth).max(), 1e-9))


def check_pair(name, gp, gx, gt):
    """Per-tensor: pallas error vs truth must be within MARGIN of the XLA
    path's own error vs truth (plus an absolute floor)."""
    ok = True
    for gn, a, b, t in zip(("dq", "dk", "dv", "dbias"), gp, gx, gt):
        ep, ex = relerr(a, t), relerr(b, t)
        bound = max(MARGIN * ex, ABS_FLOOR)
        good = ep <= bound
        ok &= good
        print(f"  {name:24s} {gn:5s} pallas_err={ep:.2e} xla_err={ex:.2e} "
              f"bound={bound:.2e}  {'OK' if good else 'FAIL'}")
    return ok


def main():
    assert jax.default_backend() == "tpu", "chip-only verification"
    ok = True

    shapes = [
        ("enc 512x512", dict(b=4, sq=512, sk=512, h=12, d=64), False),
        ("dec 128x128 causal", dict(b=4, sq=128, sk=128, h=12, d=64), True),
        ("cross 128x512", dict(b=4, sq=128, sk=512, h=12, d=64), False),
    ]

    print("[1] bias kernel vs XLA vs f32-highest truth (no dropout), "
          "bf16 inputs, compiled on chip")
    for name, sh, causal in shapes:
        q, k, v, mask, bias = _mk(**sh)

        def mkloss(fn, cast, prec=None):
            def loss(q, k, v, bias):
                if cast is not None:
                    q, k, v = (x.astype(cast) for x in (q, k, v))
                o = fn(q, k, v, bias=bias, kv_mask=mask, causal=causal,
                       scale=1.0)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def g(q, k, v, bias):
                if prec:
                    with jax.default_matmul_precision(prec):
                        return jax.value_and_grad(loss, (0, 1, 2, 3))(
                            q, k, v, bias)
                return jax.value_and_grad(loss, (0, 1, 2, 3))(q, k, v, bias)

            return jax.jit(g)

        vt, gt = mkloss(xla_attention, None, "highest")(q, k, v, bias)
        vx, gx = mkloss(xla_attention, jnp.bfloat16)(q, k, v, bias)
        vp, gp = mkloss(flash_attention_bias, jnp.bfloat16)(q, k, v, bias)
        lp = abs(float(vp) - float(vt)) / abs(float(vt))
        lx = abs(float(vx) - float(vt)) / abs(float(vt))
        lok = lp <= max(MARGIN * lx, 1e-3)
        ok &= lok
        print(f"  {name:24s} loss  pallas_err={lp:.2e} xla_err={lx:.2e}  "
              f"{'OK' if lok else 'FAIL'}")
        ok &= check_pair(name, gp, gx, gt)

    print("[2] in-kernel dropout: determinism / rng / statistics")
    q, k, v, mask, bias = _mk(b=4, sq=512, sk=512, h=12, d=64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    rate = 0.1
    f = jax.jit(functools.partial(
        flash_attention_bias, bias=bias, kv_mask=mask, causal=False,
        scale=1.0, dropout_rate=rate))
    r1, r2 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)
    a1 = f(qb, kb, vb, dropout_rng=r1)
    a1b = f(qb, kb, vb, dropout_rng=r1)
    a2 = f(qb, kb, vb, dropout_rng=r2)
    det = bool(jnp.all(a1 == a1b))
    sens = not bool(jnp.all(a1 == a2))
    print(f"  same-seed deterministic: {det}; rng-sensitive: {sens}")
    ok &= det and sens

    factors = extract_keep_factors(r1, 4, 12, 512, 512, rate)
    kept = float((np.asarray(factors) > 0).mean())
    print(f"  keep fraction {kept:.4f} (target {1-rate:.4f})")
    ok &= abs(kept - (1 - rate)) < 2e-3

    print("[3] dropout grads: kernel VJP vs XLA-with-EXTRACTED-masks "
          "(f32-highest truth, same criterion)")
    for name, sh, causal in shapes:
        q, k, v, mask, bias = _mk(**sh)
        rng = jax.random.PRNGKey(21)
        factors = extract_keep_factors(rng, sh["b"], sh["h"], sh["sq"],
                                       sh["sk"], rate)

        def mk_pallas(q, k, v, bias):
            qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
            o = flash_attention_bias(qb, kb, vb, bias=bias, kv_mask=mask,
                                     causal=causal, scale=1.0,
                                     dropout_rate=rate, dropout_rng=rng)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def mk_ref(cast):
            def loss(q, k, v, bias):
                if cast is not None:
                    q, k, v = (x.astype(cast) for x in (q, k, v))
                o = xla_with_factor(q, k, v, mask, bias, factors, causal,
                                    sh["sq"], sh["sk"])
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return loss

        def truth_g(q, k, v, bias):
            with jax.default_matmul_precision("highest"):
                return jax.value_and_grad(mk_ref(None), (0, 1, 2, 3))(
                    q, k, v, bias)

        vt, gt = jax.jit(truth_g)(q, k, v, bias)
        vx, gx = jax.jit(jax.value_and_grad(mk_ref(jnp.bfloat16),
                                            (0, 1, 2, 3)))(q, k, v, bias)
        vp, gp = jax.jit(jax.value_and_grad(mk_pallas, (0, 1, 2, 3)))(
            q, k, v, bias)
        lp = abs(float(vp) - float(vt)) / abs(float(vt))
        lx = abs(float(vx) - float(vt)) / abs(float(vt))
        lok = lp <= max(MARGIN * lx, 1e-3)
        ok &= lok
        print(f"  {name:24s} loss  pallas_err={lp:.2e} xla_err={lx:.2e}  "
              f"{'OK' if lok else 'FAIL'}")
        ok &= check_pair(f"{name} dropout", gp, gx, gt)

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
