"""Attribute dropout's cost in the grads program and A/B PRNG impls.

The r3 "split step" experiment accidentally compared dropout-on monolithic
vs dropout-off split (step_variants.py's loss_fn never passed rngs), so the
191->161 claim conflated program splitting with dropout removal. This
script times the production grads program with:
  - no dropout (deterministic)
  - dropout, threefry keys (JAX default)
  - dropout, rbg keys (TPU hardware RNG)

Run ON CHIP:  python scripts/ab_dropout.py
"""

import sys
import time

import numpy as np


def main():
    import jax

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

    def loss_fn(p, b_, rng_):
        rngs = {"dropout": rng_} if rng_ is not None else None
        out = model.apply({"params": p}, b_,
                          deterministic=rng_ is None, rngs=rngs)
        loss, _ = causal_losses(out["logits"], out["labels"],
                                cfg.max_input_length, 1)
        return loss

    grad = jax.jit(jax.value_and_grad(loss_fn))

    def timeit(key, n1=5, n2=25):
        v, g = grad(params, batch, key)
        float(v)

        def run(n):
            o = None
            t0 = time.perf_counter()
            for _ in range(n):
                o = grad(params, batch, key)
            float(o[0])
            return time.perf_counter() - t0

        ta, tb = run(n1), run(n2)
        return (tb - ta) / (n2 - n1)

    cases = [
        ("deterministic", None),
        ("dropout_threefry", jax.random.PRNGKey(1)),
        ("dropout_rbg", jax.random.key(1, impl="rbg")),
        ("dropout_unsafe_rbg", jax.random.key(1, impl="unsafe_rbg")),
    ]
    for name, key in cases:
        try:
            dt = timeit(key)
            dt2 = timeit(key)
            print(f"{name:20s} {dt * 1e3:8.2f} ms  {dt2 * 1e3:8.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
