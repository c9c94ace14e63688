"""Measure the causal-640 attention forward/backward kernel on chip.

Sizes the prize for a blocked, triangle-skipping backward: the current
_bwd_kernel recomputes full P per (b,h) and runs dense over the causal
upper triangle. Timing: two-point host-materialization (see bench.py).

Run ON CHIP:  python scripts/tune_attention_bwd.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def timeit(fn, *a, n1=5, n2=25):
    out = fn(*a)
    _drain(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*a)
        _drain(o)
        return time.perf_counter() - t0

    ta, tb = run(n1), run(n2)
    dt = (tb - ta) / (n2 - n1)
    return dt if dt > 0 else tb / n2


def _drain(out):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmgl_tpu.ops.flash_attention import flash_attention
    from mmgl_tpu.ops.attention import xla_attention

    b, h, d = 32, 12, 64
    for sq, causal in ((640, True), (512, False)):
        sk = sq
        rng = np.random.RandomState(0)
        dt = jnp.bfloat16
        q = jnp.asarray(rng.randn(b, sq, h, d), dt)
        k = jnp.asarray(rng.randn(b, sk, h, d), dt)
        v = jnp.asarray(rng.randn(b, sk, h, d), dt)
        mask = jnp.ones((b, sk), jnp.int32)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, kv_mask=mask, causal=causal)
                .astype(jnp.float32))

        def loss_xla(q, k, v):
            return jnp.sum(
                xla_attention(q, k, v, kv_mask=mask, causal=causal)
                .astype(jnp.float32))

        fwd_f = jax.jit(loss_flash)
        fwd_x = jax.jit(loss_xla)
        g_f = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
        g_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

        t_ff = timeit(fwd_f, q, k, v)
        t_fx = timeit(fwd_x, q, k, v)
        t_gf = timeit(g_f, q, k, v)
        t_gx = timeit(g_x, q, k, v)
        print(f"[s={sq} causal={causal}] fwd: pallas {t_ff*1e3:6.2f} ms  "
              f"xla {t_fx*1e3:6.2f} ms | fwd+bwd: pallas {t_gf*1e3:6.2f} ms "
              f"xla {t_gx*1e3:6.2f} ms | bwd-only pallas "
              f"{(t_gf-t_ff)*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
