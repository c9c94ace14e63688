"""Compare our Pallas attention against jax.experimental's TPU flash kernel
at the MMGL hot shape (causal, b=32 h=12 s=640 d=64, bf16), fwd and fwd+bwd.

Run ON CHIP:  python scripts/ab_libflash.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

B, H, S, D = 32, 12, 640, 64


def timeit(fn, *a, n1=10, n2=50):
    import jax
    import jax.numpy as jnp

    def drain(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf).astype(jnp.float32))

    drain(fn(*a))

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*a)
        drain(o)
        return time.perf_counter() - t0

    ta, tb = run(n1), run(n2)
    d = (tb - ta) / (n2 - n1)
    return d if d > 0 else tb / n2


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as lib_flash)

    from mmgl_tpu.ops.flash_attention import flash_attention as ours

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16
    # lib kernel wants BHSD
    q = jax.random.normal(kq, (B, H, S, D), dt)
    k = jax.random.normal(kk, (B, H, S, D), dt)
    v = jax.random.normal(kv, (B, H, S, D), dt)
    scale = D ** -0.5

    configs = {
        "lib_default": None,
        "lib_q320_k640": BlockSizes(
            block_q=320, block_k_major=640, block_k=640, block_b=1,
            block_q_major_dkv=320, block_k_major_dkv=640, block_k_dkv=640,
            block_q_dkv=320, block_k_major_dq=640, block_k_dq=640,
            block_q_dq=320),
        "lib_q128_k128": BlockSizes(
            block_q=128, block_k_major=128, block_k=128, block_b=1,
            block_q_major_dkv=128, block_k_major_dkv=128, block_k_dkv=128,
            block_q_dkv=128, block_k_major_dq=128, block_k_dq=128,
            block_q_dq=128),
        "lib_q320_k320": BlockSizes(
            block_q=320, block_k_major=320, block_k=320, block_b=1,
            block_q_major_dkv=320, block_k_major_dkv=320, block_k_dkv=320,
            block_q_dkv=320, block_k_major_dq=320, block_k_dq=320,
            block_q_dq=320),
    }

    for name, bs in configs.items():
        try:
            kwargs = dict(causal=True, sm_scale=scale)
            if bs is not None:
                kwargs["block_sizes"] = bs
            f = jax.jit(lambda q_, k_, v_: lib_flash(q_, k_, v_, **kwargs))
            ms_f = timeit(f, q, k, v) * 1e3

            def loss(q_, k_, v_):
                o = lib_flash(q_, k_, v_, **kwargs)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            ms_g = timeit(g, q, k, v) * 1e3
            print(f"{name:18s} fwd {ms_f:7.3f} ms   fwd+bwd {ms_g:7.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
        jax.clear_caches()

    # ours, same data (BSHD layout)
    qs = q.transpose(0, 2, 1, 3)
    ks = k.transpose(0, 2, 1, 3)
    vs = v.transpose(0, 2, 1, 3)
    f = jax.jit(lambda q_, k_, v_: ours(q_, k_, v_, causal=True))
    ms_f = timeit(f, qs, ks, vs) * 1e3

    def loss2(q_, k_, v_):
        o = ours(q_, k_, v_, causal=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss2, argnums=(0, 1, 2)))
    ms_g = timeit(g, qs, ks, vs) * 1e3
    print(f"{'ours_bq256':18s} fwd {ms_f:7.3f} ms   fwd+bwd {ms_g:7.3f} ms",
          flush=True)

    # numerical agreement lib vs ours
    o_lib = lib_flash(q, k, v, causal=True, sm_scale=scale)
    o_ours = ours(qs, ks, vs, causal=True).transpose(0, 2, 1, 3)
    err = float(jnp.max(jnp.abs(
        o_lib.astype(jnp.float32) - o_ours.astype(jnp.float32))))
    print(f"max_abs_err lib vs ours: {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
