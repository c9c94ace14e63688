"""Measure achievable bf16 matmul TFLOP/s on this chip at model shapes.

Calibrates the MFU denominator: the datasheet 197 TFLOP/s (v5e) is a
systolic-array peak; the achievable rate at MMGL's actual matmul shapes
bounds what any schedule can reach.

Run ON CHIP:  python scripts/probe_peak.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    shapes = [
        ("square_4k", (4096, 4096), (4096, 4096)),
        ("square_8k", (8192, 8192), (8192, 8192)),
        ("qkv_like", (20480, 768), (768, 768)),
        ("mlp_up", (20480, 768), (768, 3072)),
        ("mlp_down", (20480, 3072), (3072, 768)),
        ("head", (20480, 768), (768, 50272)),
        ("attn_qk", (640, 64), (64, 640)),
    ]
    key = jax.random.PRNGKey(0)
    for name, (m, k), (k2, n) in shapes:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k2, n), jnp.bfloat16)
        f = jax.jit(lambda x, y: jnp.dot(x, y,
                                         preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16))
        o = f(a, b)
        float(jnp.sum(o).astype(jnp.float32))
        reps = max(1, int(2e12 / (2 * m * k * n)))

        def run(r):
            o = None
            t0 = time.perf_counter()
            for _ in range(r):
                o = f(a, b)
            float(jnp.sum(o).astype(jnp.float32))
            return time.perf_counter() - t0

        t1, t2 = run(reps), run(3 * reps)
        dt = (t2 - t1) / (2 * reps)
        if dt <= 0:
            dt = t2 / (3 * reps)
        tf = 2 * m * k * n / dt / 1e12
        print(f"{name:12s} ({m}x{k})x({k2}x{n})  {tf:7.1f} TF/s  "
              f"({dt*1e6:.1f} us)", flush=True)


if __name__ == "__main__":
    main()
