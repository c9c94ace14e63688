"""Bisect the 2x gap between our dense fwd kernel (2.1 ms) and the lib's
single-step config (1.0 ms) at causal b=32 h=12 s=640 d=64 bf16.

Variants walk from the lib config toward ours one change at a time:
  v0: 4D BHSD blocks, grid (b, h, q), causal-only additive mask   (lib-like)
  v1: v0 + kv_mask input (additive, single where)
  v2: v1 but two where passes (our current mask style)
  v3: v1 with grid (b*h, q) and 3D (BH,S,D) blocks                (our layout)
  v4: v3 with fp32 logits select & separate wheres                 (= ours)
Also: v0 with cost_estimate like the lib's.

Run ON CHIP:  python scripts/tune_attention2.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

B, H, S, D = 32, 12, 640, 64
BQ = 320
NEG_INF = -1e30


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16
    q4 = jax.random.normal(kq, (B, H, S, D), dt)
    k4 = jax.random.normal(kk, (B, H, S, D), dt)
    v4 = jax.random.normal(kv, (B, H, S, D), dt)
    mask4 = jnp.ones((B, 1, S), jnp.int32)          # (B, 1, S)
    q3 = q4.reshape(B * H, S, D)
    k3 = k4.reshape(B * H, S, D)
    v3 = v4.reshape(B * H, S, D)
    mask3 = jnp.ones((B * H, 1, S), jnp.int32)
    scale = D ** -0.5

    results = {}

    def rep(name, fn, *a):
        try:
            ms = timeit(fn, *a) * 1e3
            results[name] = ms
            print(f"{name:34s} {ms:7.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        jax.clear_caches()

    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel"))

    # ---- v0: lib-like, BHSD blocks, grid (b,h,q), causal only ----
    def v0_kern(q_ref, k_ref, v_ref, o_ref):
        qq = q_ref[0, 0]
        kk_ = k_ref[0, 0]
        vv = v_ref[0, 0]
        s = jax.lax.dot_general(
            qq, kk_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        j = pl.program_id(2)
        ri = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * BQ
        ci = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = s + jnp.where(ci <= ri, 0.0, NEG_INF)
        m = jnp.max(s, axis=1)[:, None]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1)[:, None]
        p /= l
        o_ref[0, 0] = jax.lax.dot(
            p.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    v0 = pl.pallas_call(
        v0_kern,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), dt),
        grid=(B, H, S // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, j: (b, h, j, 0)),
        compiler_params=cp,
    )
    rep("v0_lib_like_bhsd_causal_only", jax.jit(v0), q4, k4, v4)

    # ---- v1: v0 + kv_mask (single additive where) ----
    def v1_kern(q_ref, k_ref, v_ref, m_ref, o_ref):
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

    v1 = pl.pallas_call(
        v1_kern,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), dt),
        grid=(B, H, S // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, j: (b, h, j, 0)),
        compiler_params=cp,
    )
    rep("v1_bhsd_with_kvmask", jax.jit(v1), q4, k4, v4, mask4)

    # ---- v2: v1 with two where passes (our mask style) ----
    def v2_kern(q_ref, k_ref, v_ref, m_ref, o_ref):
        qq = q_ref[0, 0]
        kk_ = k_ref[0, 0]
        vv = v_ref[0, 0]
        km = m_ref[0, 0]
        s = jax.lax.dot_general(
            qq, kk_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(km[None, :] > 0, s, NEG_INF)
        j = pl.program_id(2)
        ri = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * BQ
        ci = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ri >= ci, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_ref[0, 0] = jax.lax.dot_general(
            p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    v2 = pl.pallas_call(
        v2_kern,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), dt),
        grid=(B, H, S // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, j: (b, h, j, 0)),
        compiler_params=cp,
    )
    rep("v2_bhsd_two_wheres", jax.jit(v2), q4, k4, v4, mask4)

    # ---- v3: v1 logic, 3D (BH,S,D) layout, grid (bh, q) ----
    cp2 = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"))

    def v3_kern(q_ref, k_ref, v_ref, m_ref, o_ref):
        qq = q_ref[0]
        kk_ = k_ref[0]
        vv = v_ref[0]
        km = m_ref[0, 0]
        s = jax.lax.dot_general(
            qq, kk_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        j = pl.program_id(1)
        ri = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * BQ
        ci = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = (ci <= ri) & (km[None, :] > 0)
        s = s + jnp.where(ok, 0.0, NEG_INF)
        m = jnp.max(s, axis=1)[:, None]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1)[:, None]
        p /= l
        o_ref[0] = jax.lax.dot(
            p.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    v3 = pl.pallas_call(
        v3_kern,
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), dt),
        grid=(B * H, S // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda i, j: (i, j, 0)),
        compiler_params=cp2,
    )
    rep("v3_bh_flat_single_where", jax.jit(v3), q3, k3, v3, mask3)

    # ---- v0 timing again to bound drift ----
    rep("v0_again", jax.jit(v0), q4, k4, v4)

    # correctness: v1 vs xla
    def ref(q_, k_, v_):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_, k_,
                       preferred_element_type=jnp.float32) * scale
        ri = jnp.arange(S)[:, None]
        ci = jnp.arange(S)[None, :]
        s = jnp.where(ri >= ci, s, NEG_INF)
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_.dtype), v_,
                          preferred_element_type=jnp.float32).astype(q_.dtype)

    o1 = jax.jit(v1)(q4, k4, v4, mask4)
    oref = jax.jit(ref)(q4, k4, v4)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - oref.astype(jnp.float32))))
    print(f"v1 vs xla max_abs_err {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
