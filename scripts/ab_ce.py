"""A/B the custom-VJP CE against plain-autodiff CE in one process.

Run ON CHIP:  python scripts/ab_ce.py            # full-model step A/B
              python scripts/ab_ce.py --chunked  # head+loss subgraph A/B:
                  materialized fused CE vs vocab-chunked CE (VERDICT r4
                  item 7) at the production b=32 shape, n_chunks swept.
"""

import sys
import time

import numpy as np


def main_chunked():
    """Isolated head+loss cluster: hidden (B,T,D) + tied emb (V,D) ->
    loss, grads wrt (hidden, emb). This is exactly the 36.5 ms CE cluster
    the r4 captured trace named (three 1.58-TFLOP vocab matmuls + 8.2 ms
    softmax/dlogits elementwise over the 1.03 G-element logits)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from mmgl_tpu.train.losses import causal_losses, chunked_causal_losses

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    b, t, d, v = (32, 640, 768, 50272) if on_tpu else (2, 40, 32, 300)
    rng = np.random.RandomState(0)
    hidden = jax.device_put(rng.randn(b, t, d).astype(np.float32) * 0.1
                            ).astype(dtype)
    emb = jax.device_put(rng.randn(v, d).astype(np.float32) * 0.02
                         ).astype(dtype)
    labels = jax.device_put(rng.randint(4, v - 4, (b, t)).astype(np.int32))
    mil = 512 if on_tpu else 24

    def mat_loss(h, e):
        logits = jax.lax.dot_general(
            h, e, (((2,), (1,)), ((), ())))       # attend: (B,T,V) in dtype
        loss, _ = causal_losses(logits, labels, mil, 1)
        return loss

    def timeit(fn, n1=5, n2=25):
        v0, _ = fn(hidden, emb)
        float(v0)

        def run(n):
            o = None
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(hidden, emb)
            float(o[0])
            return time.perf_counter() - t0

        ta, tb = run(n1), run(n2)
        return (tb - ta) / (n2 - n1)

    base = jax.jit(jax.value_and_grad(mat_loss, argnums=(0, 1)))
    vb, gb = base(hidden, emb)
    base_ms = timeit(base) * 1e3
    print(f"materialized fused CE   loss={float(vb):.6f}  {base_ms:8.2f} ms",
          flush=True)

    for n_chunks in (4, 8, 16):
        def ch_loss(h, e, n=n_chunks):
            loss, _ = chunked_causal_losses(h, e, labels, mil, 1, n_chunks=n)
            return loss

        fn = jax.jit(jax.value_and_grad(ch_loss, argnums=(0, 1)))
        vc, gc = fn(hidden, emb)
        # numeric parity vs the materialized path (same bf16 matmuls)
        dl = abs(float(vc) - float(vb)) / max(abs(float(vb)), 1e-9)
        gerr = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b_.astype(jnp.float32)))
                  / jnp.maximum(jnp.max(jnp.abs(b_.astype(jnp.float32))),
                                1e-9))
            for a, b_ in zip(gc, gb))
        ms = timeit(fn) * 1e3
        print(f"chunked CE n={n_chunks:<3d}       loss={float(vc):.6f}  "
              f"{ms:8.2f} ms  ({base_ms / ms:.2f}x vs materialized; "
              f"dloss={dl:.2e} max_gerr={gerr:.2e})", flush=True)
        del fn
        jax.clear_caches()


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.train.losses import causal_losses

    on_tpu = jax.default_backend() == "tpu"
    margs = Arguments(
        model_name_or_path="opt-125m", context="all",
        neighbor_mode="raw", max_input_length=512, max_output_length=128,
        n_visual_tokens=4, max_image_neighbors=5,
        bf16=on_tpu, use_pallas=on_tpu)
    margs.decoder_only = True
    model, cfg = build_model(margs, vocab_size=50272)
    b = 32
    rng = np.random.RandomState(0)
    t = cfg.max_input_length + cfg.max_output_length
    n_img = 1 + cfg.max_image_neighbors
    batch = {
        "input_ids": rng.randint(4, 50000, (b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "labels": rng.randint(4, 50000, (b, t)).astype(np.int32),
        "image_positions": np.tile(
            np.arange(n_img * cfg.n_visual_tokens)[None], (b, 1)
        ).astype(np.int32),
        "images_pooled": rng.randn(b, n_img,
                                   cfg.vision.hidden_size).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = dict(variables["params"])
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    def ref_token_ce(logits, labels):
        lf = logits.astype(jnp.float32)
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        logz = jax.nn.logsumexp(lf, axis=-1)
        gold = jnp.take_along_axis(lf, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, logz - gold, 0.0), valid

    def ref_causal_losses(logits, labels, mil, pad):
        ce, valid = ref_token_ce(logits[:, :-1], labels[:, 1:])
        loss = ce.sum() / jnp.maximum(valid.sum(), 1)
        pos = jnp.arange(ce.shape[1])
        shifted = labels[:, 1:]
        span = valid & (pos[None, :] >= mil) & (shifted != pad)
        s_loss = (ce * span).sum() / jnp.maximum(span.sum(), 1)
        return loss, s_loss

    def make(losses):
        def loss_fn(p, b_):
            out = model.apply({"params": p}, b_, deterministic=True)
            loss, _ = losses(out["logits"], out["labels"],
                             cfg.max_input_length, 1)
            return loss

        return jax.jit(jax.value_and_grad(loss_fn))

    def timeit(fn, n1=5, n2=25):
        v, g = fn(params, batch)
        float(v)

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(params, batch)
            float(o[0])
            return time.perf_counter() - t0

        ta, tb = run(n1), run(n2)
        return (tb - ta) / (n2 - n1)

    for name, losses in (("autodiff_ce", ref_causal_losses),
                         ("custom_vjp_ce", causal_losses)):
        fn = make(losses)
        # interleave two measurements to expose drift
        dt1 = timeit(fn)
        dt2 = timeit(fn)
        print(f"{name:15s} {dt1 * 1e3:8.2f} ms   {dt2 * 1e3:8.2f} ms",
              flush=True)
        del fn
        jax.clear_caches()


if __name__ == "__main__":
    if "--chunked" in sys.argv:
        main_chunked()
    else:
        main()
