"""Two A/Bs on chip:
1. monolithic donated step vs split step, both with rbg dropout
   (the r3 split experiment conflated splitting with dropout removal).
2. vision tower isolation: time the CLIP tower forward at the uncached
   shape (192 images) with pallas vs xla attention dispatch.

Run ON CHIP:  python scripts/ab_split_tower.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def drain(o):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(o)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def timeit(fn, *a, n1=5, n2=25):
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

    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import (create_train_state, dropout_stream_key,
                                      make_split_train_step, make_train_step)

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
    params_host = jax.tree_util.tree_map(np.asarray,
                                         dict(variables["params"]))
    params = jax.device_put(params_host)   # donated by the monolithic run
    mask = trainable_mask(params, "none", False)
    tx = build_optimizer(margs, mask)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)
    key = dropout_stream_key(1)

    mono = jax.jit(make_train_step(model, tx, True, cfg.max_input_length, 1),
                   donate_argnums=(0,))
    st = create_train_state(params, tx)

    def run_mono(b_):
        nonlocal st
        st, m = mono(st, b_, key)
        return m["loss"]

    ms = timeit(run_mono, batch) * 1e3
    print(f"monolithic_rbg   {ms:8.2f} ms", flush=True)
    del mono, st
    jax.clear_caches()

    split = make_split_train_step(model, tx, True, cfg.max_input_length, 1)
    st2 = create_train_state(jax.device_put(params_host), tx)

    def run_split(b_):
        nonlocal st2
        st2, m = split(st2, b_, key)
        return m["loss"]

    ms = timeit(run_split, batch) * 1e3
    print(f"split_rbg        {ms:8.2f} ms", flush=True)
    del split, st2
    jax.clear_caches()

    # ---- vision tower isolation ----
    import jax.numpy as jnp

    from mmgl_tpu.models.clip import CLIPVisionModel

    n_images = b * n_img
    imgs = jnp.asarray(
        rng.rand(n_images, 224, 224, 3).astype(np.float32))
    if on_tpu:
        pass
    for use_pallas in (True, False):
        import mmgl_tpu.ops.attention as attn_mod

        tower = CLIPVisionModel(cfg.vision)
        tv = tower.init(jax.random.PRNGKey(0), imgs[:2])

        old = attn_mod.PALLAS_MIN_KV
        attn_mod.PALLAS_MIN_KV = 128 if use_pallas else 10 ** 9
        try:
            f = jax.jit(lambda p, x: tower.apply(p, x))
            ms = timeit(f, tv, imgs) * 1e3
            print(f"tower_fwd_{'pallas' if use_pallas else 'xla':6s} "
                  f"{ms:8.2f} ms  ({n_images} images)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"tower {use_pallas} FAILED: {str(e)[:200]}", flush=True)
        finally:
            attn_mod.PALLAS_MIN_KV = old
        jax.clear_caches()


if __name__ == "__main__":
    main()
