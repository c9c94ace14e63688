"""Decompose the cached train step's wall-clock on the real chip.

MFU sits at ~45% (BENCH_r02); before touching kernels, attribute the other
55%: time the full step and a ladder of ablated variants, each removing one
component. Differences between rungs give the component costs. Timing uses
the two-point host-materialization method (see bench.py docstring — plain
block_until_ready lies on this platform).

Run ON CHIP:  python scripts/ablate_step.py [--batch 32] [--model 125m]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--model", default="125m")
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.losses import causal_losses
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    margs = Arguments(
        model_name_or_path=f"opt-{args.model}", context="all",
        neighbor_mode="raw", max_input_length=512, max_output_length=128,
        n_visual_tokens=4, max_image_neighbors=5,
        bf16=on_tpu, use_pallas=on_tpu)
    margs.decoder_only = True
    model, cfg = build_model(margs, vocab_size=50272)
    b = args.batch
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
    mask = trainable_mask(params, "none", False)
    tx = build_optimizer(margs, mask)
    state = create_train_state(params, tx)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)
    key = jax.random.PRNGKey(1)

    def timeit(fn, *a):
        out = fn(*a)          # compile
        _drain(out)

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(*a)
            _drain(o)
            return time.perf_counter() - t0

        ta, tb = run(args.n1), run(args.n2)
        dt = (tb - ta) / (args.n2 - args.n1)
        return dt if dt > 0 else tb / args.n2

    def rung(name, fn, *a):
        dt = timeit(fn, *a)
        results[name] = dt
        print(f"[rung] {name:22s} {dt * 1e3:8.2f} ms", flush=True)
        import gc

        gc.collect()
        jax.clear_caches()

    def _drain(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32)
              if hasattr(leaf, "astype") else leaf)

    # ---- rungs ----
    results = {}

    from mmgl_tpu.train.steps import dropout_stream_key

    rbg_key = dropout_stream_key(1)  # the production dropout stream (rbg)

    # 1. full train step (fwd+bwd+adamw + rbg dropout), like bench.py
    step = jax.jit(make_train_step(model, tx, True, cfg.max_input_length, 1))
    st = state

    def full(st_b):
        nonlocal st
        st, m = step(st, st_b, rbg_key)
        return m["loss"]

    rung("full_step", full, batch)
    del step

    # 1b. full step, deterministic (rng=None -> no dropout RNG or masks)
    step_d = jax.jit(make_train_step(model, tx, True, cfg.max_input_length, 1))

    def full0(st_b):
        nonlocal st
        st, m = step_d(st, st_b, None)
        return m["loss"]

    rung("full_step_nodropout", full0, batch)
    del step_d

    # 1c. optimizer update alone (adamw over the full tree) — before the
    # fwd/bwd rungs so the moments can be freed afterwards
    def opt_only(st_):
        grads = jax.tree_util.tree_map(jnp.ones_like, st_.params)
        updates, opt_state = tx.update(grads, st_.opt_state, st_.params)
        return optax.apply_updates(st_.params, updates)

    rung("adamw_update", jax.jit(opt_only), state)
    # free the optimizer moments (~1 GB at 125M fp32) for the later rungs
    params = state.params
    state = st = None

    # 2. fwd+bwd only (no optimizer update)
    def loss_fn(p, b_):
        out = model.apply({"params": p}, b_, deterministic=True)
        loss, _ = causal_losses(out["logits"], out["labels"],
                                cfg.max_input_length, 1)
        return loss

    grad = jax.jit(jax.value_and_grad(loss_fn))
    rung("fwd_bwd", lambda b_: grad(params, b_)[0], batch)
    del grad

    # 3. forward only (with CE loss)
    fwd = jax.jit(loss_fn)
    rung("fwd_ce", fwd, params, batch)
    del fwd

    # 4. forward without CE (mean of logits — kills the vocab softmax)
    def fwd_nologit(p, b_):
        out = model.apply({"params": p}, b_, deterministic=True)
        return jnp.mean(out["logits"].astype(jnp.float32))

    rung("fwd_nologitce", jax.jit(fwd_nologit), params, batch)

    # 5. fwd+bwd without CE
    gn = jax.jit(jax.value_and_grad(fwd_nologit))
    rung("fwd_bwd_nologitce", lambda b_: gn(params, b_)[0], batch)
    del gn

    # 6. fwd+bwd with XLA attention instead of Pallas
    import mmgl_tpu.ops as ops
    margs2 = Arguments(**{**vars(margs), "use_pallas": False})
    margs2.decoder_only = True
    model_x, _ = build_model(margs2, vocab_size=50272)

    def loss_x(p, b_):
        out = model_x.apply({"params": p}, b_, deterministic=True)
        loss, _ = causal_losses(out["logits"], out["labels"],
                                cfg.max_input_length, 1)
        return loss

    gx = jax.jit(jax.value_and_grad(loss_x))
    rung("fwd_bwd_xla_attn", lambda b_: gx(params, b_)[0], batch)
    del gx

    print("\n=== step decomposition (ms) ===")
    for k, v in results.items():
        print(f"{k:22s} {v * 1e3:8.2f}")
    d = results
    print("\n=== derived (ms) ===")
    print(f"optimizer (full-fwd_bwd)     {(d['full_step'] - d['fwd_bwd']) * 1e3:8.2f}")
    print(f"dropout rbg (full-nodrop)    {(d['full_step'] - d['full_step_nodropout']) * 1e3:8.2f}")
    print(f"backward (fwd_bwd-fwd)       {(d['fwd_bwd'] - d['fwd_ce']) * 1e3:8.2f}")
    print(f"vocab CE fwd (fwd-nologit)   {(d['fwd_ce'] - d['fwd_nologitce']) * 1e3:8.2f}")
    print(f"vocab CE fwd+bwd             {(d['fwd_bwd'] - d['fwd_bwd_nologitce']) * 1e3:8.2f}")
    print(f"pallas win fwd+bwd (xla-pallas) {(d['fwd_bwd_xla_attn'] - d['fwd_bwd']) * 1e3:8.2f}")


if __name__ == "__main__":
    main()
