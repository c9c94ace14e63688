"""A/B the custom-VJP CE against plain-autodiff CE in one process.

Run ON CHIP:  python scripts/ab_ce.py
"""

import sys
import time

import numpy as np


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
    main()
