"""A/B the Pallas bias attention kernel vs the XLA path at T5's shapes.

T5's every self-attention carries a (1, H, Sq, Sk) batch-shared additive
relative-position bias (models/t5.py compute_position_bias; reference
modelling_self_attention.py:65-68 trains t5-base); cross-attention carries
none. This measures fwd+bwd at the t5-base production shapes (b=16, h=12,
d=64, enc 512x512 / dec 128x128 causal / cross 128x512) for:

  * xla        — unfused einsum attention with the bias added (r3 behavior)
  * pallas     — flash_attention_bias (fused bias, VERDICT r4 item 1)
and, with --dropout, the same pair with attention-prob dropout 0.1
(XLA bernoulli mask vs in-kernel hardware-PRNG regeneration).

The dbias gradient is included in both (the rel-pos embedding trains).

Run ON CHIP:  python scripts/ab_t5_attention.py [--dropout]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mmgl_tpu.ops.attention import xla_attention  # noqa: E402
from mmgl_tpu.ops.flash_attention import flash_attention_bias  # noqa: E402


def measure(step, args_, n1, n2):
    val, _ = step(*args_)
    float(val)                        # compile + drain

    def run(n):
        t0 = time.perf_counter()
        v = None
        for _ in range(n):
            v, _ = step(*args_)
        float(v)
        return time.perf_counter() - t0

    ta, tb = run(n1), run(n2)
    dt = (tb - ta) / (n2 - n1)
    return dt if dt > 0 else tb / n2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dropout", action="store_true")
    ap.add_argument("--n1", type=int, default=10)
    ap.add_argument("--n2", type=int, default=50)
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "chip-only measurement"
    b, h, d = args.batch, 12, 64
    rate = 0.1 if args.dropout else 0.0
    rng = jax.random.PRNGKey(3)

    shapes = [
        ("enc_self_512", dict(sq=512, sk=512, causal=False, bias=True)),
        ("dec_self_128", dict(sq=128, sk=128, causal=True, bias=True)),
        ("cross_128_512", dict(sq=128, sk=512, causal=False, bias=False)),
    ]
    for name, sh in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q = jax.random.normal(ks[0], (b, sh["sq"], h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, sh["sk"], h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, sh["sk"], h, d), jnp.bfloat16)
        mask = jnp.ones((b, sh["sk"]), jnp.int32)
        bias = (jax.random.normal(ks[3], (1, h, sh["sq"], sh["sk"]),
                                  jnp.float32)
                if sh["bias"] else None)

        def mk(fn):
            def loss(q, k, v, bias):
                o = fn(q, k, v, bias=bias, kv_mask=mask,
                       causal=sh["causal"], scale=1.0, dropout_rate=rate,
                       dropout_rng=rng if rate else None)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.jit(jax.value_and_grad(loss, (0, 1, 2, 3)))

        if bias is None:
            # grad-w.r.t.-None is ill-posed; use a zero bias so both paths
            # still take (and differentiate) the bias argument
            bias = jnp.zeros((1, h, sh["sq"], sh["sk"]), jnp.float32)
        res = {}
        # pallas_serial = the r4 row-serial backward grid; pallas_batched =
        # the r5 grid-(H,) in-kernel-batch backward (targets the dec/cross
        # short-query shapes the serial grid loses). Env is read at trace
        # time — clear jit caches between variants.
        variants = (("pallas_batched", flash_attention_bias, "1"),
                    ("pallas_serial", flash_attention_bias, "0"),
                    ("xla", xla_attention, None))
        import os

        for impl, fn, env in variants:
            print(f"[ab] {name} {impl} ...", file=sys.stderr, flush=True)
            if env is not None:
                # toggle fwd and bwd together: serial = the r4 schedule
                os.environ["MMGL_BIAS_BWD_BATCHED"] = env
                os.environ["MMGL_BIAS_FWD_BATCHED"] = env
            jax.clear_caches()
            res[impl] = measure(mk(fn), (q, k, v, bias), args.n1, args.n2)
        os.environ.pop("MMGL_BIAS_BWD_BATCHED", None)
        os.environ.pop("MMGL_BIAS_FWD_BATCHED", None)
        tag = "+drop" if args.dropout else ""
        best = min(res["pallas_batched"], res["pallas_serial"])
        print(f"{name}{tag:6s} b={b}: pallas_batched "
              f"{res['pallas_batched']*1e3:7.3f} ms  pallas_serial "
              f"{res['pallas_serial']*1e3:7.3f} ms  "
              f"xla {res['xla']*1e3:7.3f} ms  "
              f"best_speedup {res['xla']/best:.2f}x", flush=True)


if __name__ == "__main__":
    main()
