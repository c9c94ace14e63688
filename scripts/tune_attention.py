"""Sweep Pallas attention kernel configs at MMGL's hot shape.

Shape: causal self-attention b=32 h=12 sq=sk=640 d=64 bf16 — 12 of these per
forward. bench.py --kernel put the current kernel at 4.26 ms fwd+bwd per
layer (~51 ms of the 154 ms fwd_bwd step); the d=64-adjusted roofline is
~1.3 ms. This harness times forward variants (query block size, grid
dimension semantics, one-block-per-bh, streaming causal) and backward
variants (current full-recompute single program vs query/key-blocked split
dQ / dKV programs) independently.

Run ON CHIP:  python scripts/tune_attention.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, H, S, D = 32, 12, 640, 64
NEG_INF = -1e30


def timeit(fn, *a, n1=10, n2=50):
    import jax

    o = fn(*a)
    jax.tree_util.tree_leaves(o)[0].block_until_ready()
    import jax.numpy as jnp

    def drain(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf).astype(jnp.float32))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*a)
        drain(o)
        return time.perf_counter() - t0

    ta, tb = run(n1), run(n2)
    dt = (tb - ta) / (n2 - n1)
    return dt if dt > 0 else tb / n2


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mmgl_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16
    q = jax.random.normal(kq, (B * H, S, D), dt)
    k = jax.random.normal(kk, (B * H, S, D), dt)
    v = jax.random.normal(kv, (B * H, S, D), dt)
    do = jax.random.normal(kq, (B * H, S, D), dt)
    mask = jnp.ones((B * H, 1, S), jnp.int32)
    scale = D ** -0.5

    # ---------------- forward variants ----------------

    def fwd_dense(bq, dimsem):
        def kern(q_ref, k_ref, v_ref, mask_ref, o_ref):
            qblk = q_ref[0]
            kk_ = k_ref[0]
            vv = v_ref[0]
            km = mask_ref[0, 0]
            logits = jax.lax.dot_general(
                qblk, kk_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(km[None, :] > 0, logits, NEG_INF)
            j = pl.program_id(1)
            qi = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + j * bq
            ki = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(qi >= ki, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[0] = jax.lax.dot_general(
                p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

        grid = (B * H, S // bq)
        kwargs = {}
        if dimsem:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"))
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B * H, S, D), dt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            **kwargs,
        )
        return jax.jit(lambda q_, k_, v_, m_: f(q_, k_, v_, m_))

    def fwd_dense_multibh(bq, nbh, dimsem=True):
        """nbh (b*h) rows per program — amortize per-program overhead."""
        def kern(q_ref, k_ref, v_ref, mask_ref, o_ref):
            j = pl.program_id(1)
            for z in range(nbh):
                qblk = q_ref[z]
                kk_ = k_ref[z]
                vv = v_ref[z]
                km = mask_ref[z, 0]
                logits = jax.lax.dot_general(
                    qblk, kk_, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                logits = jnp.where(km[None, :] > 0, logits, NEG_INF)
                qi = jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 0) + j * bq
                ki = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                logits = jnp.where(qi >= ki, logits, NEG_INF)
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o_ref[z] = jax.lax.dot_general(
                    p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)

        grid = (B * H // nbh, S // bq)
        kwargs = {}
        if dimsem:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"))
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B * H, S, D), dt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((nbh, bq, D), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbh, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbh, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbh, 1, S), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nbh, bq, D), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            **kwargs,
        )
        return jax.jit(lambda q_, k_, v_, m_: f(q_, k_, v_, m_))

    def fwd_stream(bq, bk, dimsem=True):
        """Causal online-softmax with block skipping: query block j only
        loops keys < (j+1)*bq."""
        def kern(q_ref, k_ref, v_ref, mask_ref, o_ref):
            j = pl.program_id(1)
            qblk = q_ref[0]
            n_kb = ((j + 1) * bq + bk - 1) // bk
            qi = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + j * bq

            def body(kb, carry):
                m_i, l_i, acc = carry
                kc = k_ref[0, pl.ds(kb * bk, bk)]
                vc = v_ref[0, pl.ds(kb * bk, bk)]
                mc = mask_ref[0, 0, pl.ds(kb * bk, bk)]
                logits = jax.lax.dot_general(
                    qblk, kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                ki = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 1) + kb * bk
                ok = (mc[None, :] > 0) & (qi >= ki)
                logits = jnp.where(ok, logits, NEG_INF)
                m_new = jnp.maximum(m_i, jnp.max(logits, axis=-1))
                alpha = jnp.exp(m_i - m_new)
                p = jnp.exp(logits - m_new[:, None])
                l_new = l_i * alpha + jnp.sum(p, axis=-1)
                acc = acc * alpha[:, None] + jax.lax.dot_general(
                    p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_new, l_new, acc

            m0 = jnp.full((bq,), NEG_INF, jnp.float32)
            l0 = jnp.zeros((bq,), jnp.float32)
            a0 = jnp.zeros((bq, D), jnp.float32)
            _, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
            o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(
                o_ref.dtype)

        grid = (B * H, S // bq)
        kwargs = {}
        if dimsem:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"))
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B * H, S, D), dt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            **kwargs,
        )
        return jax.jit(lambda q_, k_, v_, m_: f(q_, k_, v_, m_))

    print("=== forward (ms) ===", flush=True)
    results = {}

    def rep(name, maker, *a):
        try:
            fn = maker(*a)
            ms = timeit(fn, q, k, v, mask) * 1e3
            results[name] = ms
            print(f"{name:36s} {ms:7.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        jax.clear_caches()

    # current kernel for reference (via public API, includes transposes)
    q4 = q.reshape(B, H, S, D).transpose(0, 2, 1, 3)
    k4 = k.reshape(B, H, S, D).transpose(0, 2, 1, 3)
    v4 = v.reshape(B, H, S, D).transpose(0, 2, 1, 3)
    cur = jax.jit(functools.partial(flash_attention, causal=True))
    ms = timeit(lambda a_, b_, c_: cur(a_, b_, c_), q4, k4, v4) * 1e3
    print(f"{'current_public_api_bq256':36s} {ms:7.3f}", flush=True)

    rep("dense_bq128", fwd_dense, 128, False)
    rep("dense_bq128_dimsem", fwd_dense, 128, True)
    rep("dense_bq320_dimsem", fwd_dense, 320, True)
    rep("dense_bq640_dimsem", fwd_dense, 640, True)
    rep("dense_bq128_nbh4", fwd_dense_multibh, 128, 4)
    rep("dense_bq320_nbh2", fwd_dense_multibh, 320, 2)
    rep("dense_bq640_nbh2", fwd_dense_multibh, 640, 2)
    rep("stream_bq128_bk128", fwd_stream, 128, 128)
    rep("stream_bq128_bk256", fwd_stream, 128, 256)
    rep("stream_bq320_bk320", fwd_stream, 320, 320)
    rep("stream_bq128_bk640", fwd_stream, 128, 640)

    # roofline note
    flops = 4 * B * H * S * S * D
    print(f"[roofline] dense fwd {flops/1e9:.1f} GFLOP; "
          f"@98TF/s(d=64) = {flops/98e12*1e3:.3f} ms; "
          f"causal-skipped ~{flops/2/98e12*1e3:.3f} ms", flush=True)

    # ---------------- backward variants ----------------
    # current: via public API vjp
    def loss_cur(q_, k_, v_):
        o = cur(q_, k_, v_)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_cur = jax.jit(jax.grad(loss_cur, argnums=(0, 1, 2)))
    ms = timeit(g_cur, q4, k4, v4) * 1e3
    print(f"\n=== backward+forward (ms) ===", flush=True)
    print(f"{'current_vjp_total':36s} {ms:7.3f}", flush=True)
    jax.clear_caches()

    # split bwd: dQ program blocked over q, dKV program blocked over k
    def bwd_split(bq, bk):
        def dq_kern(q_ref, k_ref, v_ref, mask_ref, do_ref, delta_ref,
                    lse_ref, dq_ref):
            j = pl.program_id(1)
            qblk = q_ref[0]
            doblk = do_ref[0]
            delta = delta_ref[0, 0, pl.ds(j * bq, bq)]   # (bq,)
            lse = lse_ref[0, 0, pl.ds(j * bq, bq)]       # (bq,)
            n_kb = ((j + 1) * bq + bk - 1) // bk
            qi = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + j * bq

            def body(kb, acc):
                kc = k_ref[0, pl.ds(kb * bk, bk)]
                vc = v_ref[0, pl.ds(kb * bk, bk)]
                mc = mask_ref[0, 0, pl.ds(kb * bk, bk)]
                logits = jax.lax.dot_general(
                    qblk, kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                ki = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 1) + kb * bk
                ok = (mc[None, :] > 0) & (qi >= ki)
                p = jnp.where(ok, jnp.exp(logits - lse[:, None]), 0.0)
                dp = jax.lax.dot_general(
                    doblk, vc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = (p * (dp - delta[:, None]) * scale).astype(qblk.dtype)
                return acc + jax.lax.dot_general(
                    ds, kc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                0, n_kb, body, jnp.zeros((bq, D), jnp.float32))
            dq_ref[0] = acc.astype(dq_ref.dtype)

        def dkv_kern(q_ref, k_ref, v_ref, mask_ref, do_ref, delta_ref,
                     lse_ref, dk_ref, dv_ref):
            jk = pl.program_id(1)
            kblk = k_ref[0]                 # (bk, D)
            vblk = v_ref[0]
            mc = mask_ref[0, 0, pl.ds(jk * bk, bk)]   # (bk,)
            nq = S // bq
            ki = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk

            def body(qb, carry):
                dk_acc, dv_acc = carry
                qc = q_ref[0, pl.ds(qb * bq, bq)]
                doc = do_ref[0, pl.ds(qb * bq, bq)]
                lse = lse_ref[0, 0, pl.ds(qb * bq, bq)]
                delta = delta_ref[0, 0, pl.ds(qb * bq, bq)]
                logits = jax.lax.dot_general(
                    qc, kblk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                qi = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 0) + qb * bq
                ok = (mc[None, :] > 0) & (qi >= ki)
                p = jnp.where(ok, jnp.exp(logits - lse[:, None]), 0.0)
                dv_acc = dv_acc + jax.lax.dot_general(
                    p.astype(doc.dtype), doc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(
                    doc, vblk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = (p * (dp - delta[:, None]) * scale).astype(qc.dtype)
                dk_acc = dk_acc + jax.lax.dot_general(
                    ds, qc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return dk_acc, dv_acc

            # causal: query blocks < jk*bk//bq contribute nothing
            q_lo = (jk * bk) // bq
            z = jnp.zeros((bk, D), jnp.float32)
            dk_acc, dv_acc = jax.lax.fori_loop(q_lo, nq, body, (z, z))
            dk_ref[0] = dk_acc.astype(dk_ref.dtype)
            dv_ref[0] = dv_acc.astype(dv_ref.dtype)

        cp = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
        spec_q = pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        spec_full = pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        spec_m = pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_r = pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_rfull = pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        spec_k = pl.BlockSpec((1, bk, D), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)

        dq_call = pl.pallas_call(
            dq_kern,
            out_shape=jax.ShapeDtypeStruct((B * H, S, D), dt),
            grid=(B * H, S // bq),
            in_specs=[spec_q, spec_full, spec_full, spec_m, spec_q,
                      spec_r, spec_r],
            out_specs=spec_q, compiler_params=cp)
        dkv_call = pl.pallas_call(
            dkv_kern,
            out_shape=(jax.ShapeDtypeStruct((B * H, S, D), dt),
                       jax.ShapeDtypeStruct((B * H, S, D), dt)),
            grid=(B * H, S // bk),
            in_specs=[spec_full, spec_k, spec_k, spec_m, spec_full,
                      spec_rfull, spec_rfull],
            out_specs=(spec_k, spec_k), compiler_params=cp)

        def bwd(q_, k_, v_, m_, do_, delta, lse):
            dq = dq_call(q_, k_, v_, m_, do_, delta, lse)
            dk, dv = dkv_call(q_, k_, v_, m_, do_, delta, lse)
            return dq, dk, dv

        return jax.jit(bwd)

    # fwd that also returns lse (for split bwd)
    def fwd_with_lse(bq):
        def kern(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref):
            j = pl.program_id(1)
            qblk = q_ref[0]
            kk_ = k_ref[0]
            vv = v_ref[0]
            km = mask_ref[0, 0]
            logits = jax.lax.dot_general(
                qblk, kk_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(km[None, :] > 0, logits, NEG_INF)
            qi = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + j * bq
            ki = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(qi >= ki, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            sden = jnp.sum(e, axis=-1, keepdims=True)
            p = e / sden
            o_ref[0] = jax.lax.dot_general(
                p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
            lse_ref[0, 0, pl.ds(j * bq, bq)] = (jnp.log(sden[:, 0])
                                                + m[:, 0])

        f = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((B * H, S, D), dt),
                       jax.ShapeDtypeStruct((B * H, 1, S), jnp.float32)),
            grid=(B * H, S // bq),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )
        return jax.jit(lambda q_, k_, v_, m_: f(q_, k_, v_, m_))

    for bq, bk in ((128, 128), (320, 320), (128, 256)):
        try:
            fwd_fn = fwd_with_lse(bq if bq <= 320 else 320)
            o, lse = fwd_fn(q, k, v, mask)
            delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                            axis=-1)[:, None, :]
            bwd_fn = bwd_split(bq, bk)

            def full(q_, k_, v_, m_, do_):
                o_, lse_ = fwd_fn(q_, k_, v_, m_)
                delta_ = jnp.sum(
                    do_.astype(jnp.float32) * o_.astype(jnp.float32),
                    -1)[:, None, :]
                return bwd_fn(q_, k_, v_, m_, do_, delta_, lse_)

            fullj = jax.jit(full)
            ms = timeit(fullj, q, k, v, mask, do) * 1e3
            print(f"{'split_fwd+bwd_bq%d_bk%d' % (bq, bk):36s} {ms:7.3f}",
                  flush=True)
            # correctness vs XLA reference
            def ref(q_, k_, v_):
                logits = jnp.einsum(
                    "bqd,bkd->bqk", q_, k_,
                    preferred_element_type=jnp.float32) * scale
                qi = jnp.arange(S)[:, None]
                ki = jnp.arange(S)[None, :]
                logits = jnp.where(qi >= ki, logits, NEG_INF)
                p = jax.nn.softmax(logits, -1)
                return jnp.einsum("bqk,bkd->bqd", p.astype(v_.dtype), v_,
                                  preferred_element_type=jnp.float32
                                  ).astype(q_.dtype)

            def loss_ref(q_, k_, v_):
                return jnp.sum(
                    (ref(q_, k_, v_).astype(jnp.float32) *
                     do.astype(jnp.float32)))

            gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(
                q[:2], k[:2], v[:2])
            # recompute split on 2 rows for check — reuse full pipeline
            dq, dk, dv = fullj(q, k, v, mask, do)
            for name, a_, b_ in (("dq", dq[:2], gr[0]), ("dk", dk[:2], gr[1]),
                                 ("dv", dv[:2], gr[2])):
                err = float(jnp.max(jnp.abs(
                    a_.astype(jnp.float32) - b_.astype(jnp.float32))))
                ref_mag = float(jnp.max(jnp.abs(b_.astype(jnp.float32))))
                print(f"   {name} max_abs_err {err:.4f} (ref max {ref_mag:.2f})",
                      flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"split_bq{bq}_bk{bk} FAILED: {e}", flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
