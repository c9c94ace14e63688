"""A/B an all-heads-in-VMEM LM attention schedule vs the production kernel.

The captured trace (PARITY.md r4 step budget) shows 16.9 ms/step of layout
copies in the cached step — dominated by the BSHD -> (B*H, S, D) physical
transposes around the per-(b,h) attention custom-calls. Candidate: take
q/k/v straight in (B, S, H*D) layout (exactly what the QKV projections
produce), grid (B, H/2), block (1, SP, 2*64=128 lanes) — two heads per
program keeps the working set under the ~16 MB VMEM budget while the
contiguous 128-lane column slice needs NO transpose at all.

Measures jit(value_and_grad) from BSHD inputs (so the production path pays
its transposes here too) at the cached-step shape b=32 h=12 s=640 causal.

Run ON CHIP:  python scripts/tune_attention_allheads.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mmgl_tpu.ops.flash_attention import (NEG_INF, _pad_to, flash_attention,
                                           flash_attention_allheads)

B, S, H, D = 32, 640, 12, 64
HP = 2  # heads per program


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, causal, s):
    kv_mask = mask_ref[0, 0]
    for h in range(HP):
        q = q_ref[0, :, h * D:(h + 1) * D]
        k = k_ref[0, :, h * D:(h + 1) * D]
        v = v_ref[0, :, h * D:(h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(qi >= ki, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * D:(h + 1) * D] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, s):
    kv_mask = mask_ref[0, 0]
    for h in range(HP):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        o = o_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kv_mask[None, :] > 0, logits, NEG_INF)
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            ki = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(qi >= ki, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p_n = p.astype(q.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p_n, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _spec():
    return pl.BlockSpec((1, S, HP * D), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)


def _mask_spec():
    return pl.BlockSpec((1, 1, S), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def allheads(q, k, v, kv_mask, scale, causal):
    return _allheads_fwd_impl(q, k, v, kv_mask, scale, causal)


INTERPRET = False


def _allheads_fwd_impl(q, k, v, kv_mask, scale, causal):
    mask_p = kv_mask[:, None, :]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal, s=S),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H // HP),
        in_specs=[_spec(), _spec(), _spec(), _mask_spec()],
        out_specs=_spec(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * S * H * D,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=B * S * S * H),
        interpret=INTERPRET,
    )(q, k, v, mask_p)


def _allheads_vjp_fwd(q, k, v, kv_mask, scale, causal):
    out = _allheads_fwd_impl(q, k, v, kv_mask, scale, causal)
    return out, (q, k, v, kv_mask, out)


def _allheads_vjp_bwd(scale, causal, res, dout):
    q, k, v, kv_mask, out = res
    mask_p = kv_mask[:, None, :]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal, s=S),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),) * 3,
        grid=(B, H // HP),
        in_specs=[_spec(), _spec(), _spec(), _mask_spec(), _spec(), _spec()],
        out_specs=(_spec(), _spec(), _spec()),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * S * S * H * D,
            bytes_accessed=8 * q.size * q.dtype.itemsize,
            transcendentals=B * S * S * H),
        interpret=INTERPRET,
    )(q, k, v, mask_p, dout, out)
    return dq, dk, dv, None


allheads.defvjp(_allheads_vjp_fwd, _allheads_vjp_bwd)


# (b, s, h, d, causal): the production aligned shapes — LM self-attn
# 640-causal (OPT/MPT cached step) and the 512 non-causal text-tower shape
# (RoBERTa neighbor re-encode in the uncached step).
SHAPES = [
    (32, 640, 12, 64, True),
    (32, 512, 12, 64, False),
    (96, 512, 12, 64, False),
]


def main():
    assert jax.default_backend() == "tpu"
    for b, s, h, d, causal in SHAPES:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        # BSHD inputs, like the model's projection outputs (reshaped view of
        # (B, S, H*D) — free), so the production path pays its transposes
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        mask = jnp.ones((b, s), jnp.int32)
        scale = d ** -0.5

        def loss_prod(q, k, v):
            o = flash_attention(q, k, v, kv_mask=mask, causal=causal,
                                scale=scale)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_allheads(q, k, v):
            # the PRODUCTION implementation (flash_attention.py), not the
            # local prototype kernels above
            o = flash_attention_allheads(q, k, v, kv_mask=mask,
                                         causal=causal, scale=scale)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        # parity first
        vp, gp = jax.jit(jax.value_and_grad(loss_prod, (0, 1, 2)))(q, k, v)
        va, ga = jax.jit(jax.value_and_grad(loss_allheads, (0, 1, 2)))(q, k, v)
        print(f"--- b={b} s={s} h={h} d={d} causal={causal}", flush=True)
        print(f"loss rel diff {abs(float(vp)-float(va))/abs(float(vp)):.2e}",
              flush=True)
        for n, ga_, gp_ in zip("qkv", ga, gp):
            ga_ = np.asarray(ga_, np.float32).reshape(-1)
            gp_ = np.asarray(gp_, np.float32).reshape(-1)
            print(f"d{n} max rel-of-max "
                  f"{np.abs(ga_-gp_).max()/np.abs(gp_).max():.2e}", flush=True)

        for name, fn in (("production", loss_prod),
                         ("allheads", loss_allheads)):
            step = jax.jit(jax.value_and_grad(fn, (0, 1, 2)))
            val, _ = step(q, k, v)
            float(val)

            def run(n):
                t0 = time.perf_counter()
                v_ = None
                for _ in range(n):
                    v_, _ = step(q, k, v)
                float(v_)
                return time.perf_counter() - t0

            for trial in range(2):
                ta, tb = run(20), run(100)
                dt = (tb - ta) / 80
                print(f"{name} trial{trial}: {dt*1e3:7.3f} ms fwd+bwd",
                      flush=True)


if __name__ == "__main__":
    main()
