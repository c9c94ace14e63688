"""Tune the 197-patch CLIP-tower attention (VERDICT r3 weak #1 / item 2).

The uncached (reference-shaped) step re-encodes 192 images per step; its
attention shape is (b=192, s=197, h=12, d=64), FORWARD-ONLY (frozen tower).
197 is lane-misaligned, so dispatch sends it to XLA; an r3 measurement of
the naive padded Pallas kernel lost 101.5 vs 67.4 ms at the tower level —
but that padded 197->256 with BQ=256 and measured the WHOLE tower. This
isolates the attention and measures every plausible schedule:

  xla            — production dispatch today (einsum + masked softmax)
  xla_nomask     — XLA on the raw 197 (no mask needed: all patches valid;
                   dispatch can't know that, but it bounds what masking costs)
  pallas_bq256   — kv_mask-padded kernel, one 256-row query block
  pallas_bq128   — padded, two 128-row query blocks (less pad waste per
                   block; 59 dead rows concentrated in block 2)
  fused_heads    — one program per IMAGE computing all 12 heads in-kernel
                   (12x fewer block fetches; the (256,768) QKV stays VMEM-
                   resident across heads)

Run ON CHIP:  python scripts/tune_vision_attention.py [--images 192]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mmgl_tpu.ops.attention import xla_attention  # noqa: E402
from mmgl_tpu.ops.flash_attention import flash_attention  # noqa: E402

S, H, D = 197, 12, 64
SP = 256  # padded


def _fused_heads_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, nheads):
    # one program per image: q/k/v (SP, H*D); loop heads, each (SP, D)
    for h in range(nheads):
        q = q_ref[0, :, h * D:(h + 1) * D]
        k = k_ref[0, :, h * D:(h + 1) * D]
        v = v_ref[0, :, h * D:(h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        k_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(k_idx < S, logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * D:(h + 1) * D] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def fused_heads(q, k, v, scale):
    """q/k/v: (B, SP, H*D) padded; one grid step per image."""
    b = q.shape[0]
    spec = pl.BlockSpec((1, SP, H * D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_heads_kernel, scale=scale, nheads=H),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * SP * SP * H * D,
            bytes_accessed=3 * q.size * q.dtype.itemsize,
            transcendentals=b * SP * SP * H,
        ),
    )(q, k, v)


def timeit(fn, *a, n1=10, n2=50):
    o = fn(*a)
    float(jnp.sum(o[0].astype(jnp.float32)) if isinstance(o, tuple)
          else jnp.sum(o.astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*a)
        float(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    ta, tb = run(n1), run(n2)
    dt = (tb - ta) / (n2 - n1)
    return dt if dt > 0 else tb / n2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=192)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"
    b = args.images
    scale = D ** -0.5

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, S, H, D), jnp.bfloat16)
    mask197 = jnp.ones((b, S), jnp.int32)
    # padded variants
    pad = [(0, 0), (0, SP - S), (0, 0), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    maskp = jnp.pad(mask197, [(0, 0), (0, SP - S)])
    q2 = qp.reshape(b, SP, H * D)
    k2 = kp.reshape(b, SP, H * D)
    v2 = vp.reshape(b, SP, H * D)

    import mmgl_tpu.ops.flash_attention as fa

    res = {}
    res["xla"] = timeit(jax.jit(lambda q, k, v: xla_attention(
        q, k, v, kv_mask=mask197)), q, k, v)
    res["xla_nomask"] = timeit(jax.jit(lambda q, k, v: xla_attention(
        q, k, v)), q, k, v)

    def mk_flash(bq):
        old = fa._pick_bq
        fa._pick_bq = lambda sq: bq

        def f(q, k, v, m):
            return flash_attention(q, k, v, kv_mask=m)[:, :S]
        g = jax.jit(f)
        out = timeit(g, qp, kp, vp, maskp)
        fa._pick_bq = old
        return out

    res["pallas_bq256"] = mk_flash(256)
    res["pallas_bq128"] = mk_flash(128)
    res["fused_heads"] = timeit(
        jax.jit(lambda q, k, v: fused_heads(q, k, v, scale)), q2, k2, v2)

    best = min(res, key=res.get)
    for name, dt in sorted(res.items(), key=lambda kv: kv[1]):
        print(f"{name:14s} {dt*1e3:8.3f} ms  ({res['xla']/dt:.2f}x vs xla)")
    print(f"best: {best}")


if __name__ == "__main__":
    main()
