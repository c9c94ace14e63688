"""Round-robin interleaved timing of the fwd-kernel candidates (min of 5
passes each) to beat chip/tunnel noise, plus the same for bwd candidates.

Run ON CHIP:  python scripts/tune_attention3.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

B, H, S, D = 32, 12, 640, 64
NEG_INF = -1e30
PASSES = 5
N = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as lib_flash)

    from mmgl_tpu.ops.flash_attention import flash_attention as ours

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16
    q4 = jax.random.normal(kq, (B, H, S, D), dt)      # BHSD
    k4 = jax.random.normal(kk, (B, H, S, D), dt)
    v4 = jax.random.normal(kv, (B, H, S, D), dt)
    mask4 = jnp.ones((B, 1, S), jnp.int32)
    qs = q4.transpose(0, 2, 1, 3)                     # BSHD for ours
    ks = k4.transpose(0, 2, 1, 3)
    vs = v4.transpose(0, 2, 1, 3)
    scale = D ** -0.5

    def bhsd_kernel(BQ):
        def kern(q_ref, k_ref, v_ref, m_ref, o_ref):
            qq = q_ref[0, 0]
            kk_ = k_ref[0, 0]
            vv = v_ref[0, 0]
            km = m_ref[0, 0]
            s = jax.lax.dot_general(
                qq, kk_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            j = pl.program_id(2)
            ri = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * BQ
            ci = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            ok = (ci <= ri) & (km[None, :] > 0)
            s = s + jnp.where(ok, 0.0, NEG_INF)
            m = jnp.max(s, axis=1)[:, None]
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1)[:, None]
            p /= l
            o_ref[0, 0] = jax.lax.dot(
                p.astype(vv.dtype), vv,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, H, S, D), dt),
            grid=(B, H, S // BQ),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, D), lambda b, h, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda b, h, j: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, BQ, D),
                                   lambda b, h, j: (b, h, j, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )
        return jax.jit(lambda a, b, c, d: f(a, b, c, d))

    lib_bs = BlockSizes(
        block_q=320, block_k_major=640, block_k=640, block_b=1,
        block_q_major_dkv=320, block_k_major_dkv=640, block_k_dkv=640,
        block_q_dkv=320, block_k_major_dq=640, block_k_dq=640,
        block_q_dq=320)

    fwd_cands = {
        "ours_current": (jax.jit(
            lambda a, b, c: ours(a, b, c, causal=True)), (qs, ks, vs)),
        "bhsd_bq320": (bhsd_kernel(320), (q4, k4, v4, mask4)),
        "bhsd_bq640": (bhsd_kernel(640), (q4, k4, v4, mask4)),
        "lib_q320_k640": (jax.jit(
            lambda a, b, c: lib_flash(a, b, c, causal=True,
                                      sm_scale=scale,
                                      block_sizes=lib_bs)), (q4, k4, v4)),
    }

    def drain(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf).astype(jnp.float32))

    def one_pass(fn, args):
        drain(fn(*args))
        t0 = time.perf_counter()
        o = None
        for _ in range(N):
            o = fn(*args)
        drain(o)
        return (time.perf_counter() - t0) / N

    mins = {k: float("inf") for k in fwd_cands}
    for p in range(PASSES):
        for name, (fn, args) in fwd_cands.items():
            dt_ = one_pass(fn, args)
            mins[name] = min(mins[name], dt_)
    print("=== fwd (min ms over 5 interleaved passes) ===", flush=True)
    for name, v in mins.items():
        print(f"{name:20s} {v * 1e3:7.3f}", flush=True)

    # ---- fwd+bwd candidates ----
    def vjp_of(fn, args, is_ours):
        def loss(*a):
            o = fn(*a)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss, argnums=tuple(
            range(3)))), args

    bwd_cands = {
        "ours_current": vjp_of(
            lambda a, b, c: ours(a, b, c, causal=True), (qs, ks, vs), True),
        "lib": vjp_of(
            lambda a, b, c: lib_flash(a, b, c, causal=True, sm_scale=scale,
                                      block_sizes=lib_bs),
            (q4, k4, v4), False),
    }
    mins = {k: float("inf") for k in bwd_cands}
    for p in range(PASSES):
        for name, (fn, args) in bwd_cands.items():
            dt_ = one_pass(fn, args)
            mins[name] = min(mins[name], dt_)
    print("=== fwd+bwd (min ms over 5 interleaved passes) ===", flush=True)
    for name, v in mins.items():
        print(f"{name:20s} {v * 1e3:7.3f}", flush=True)


if __name__ == "__main__":
    main()
