"""Why does the monolithic train step cost more than fwd_bwd + update?

Isolated on-chip measurements (scripts/ablate_step.py, round 3):
fwd_bwd=154.7 ms and the full optimizer chain alone=7.5 ms, yet the
monolithic jitted step runs ~191-204 ms. This script times step variants to
find the composition overhead, and captures an xplane trace of the
monolithic step for op-level attribution.

Run ON CHIP:  python scripts/step_variants.py [--batch 32]
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
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--skip_monolithic", action="store_true")
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
    from mmgl_tpu.train.steps import TrainState, create_train_state, \
        make_train_step

    on_tpu = jax.default_backend() == "tpu"
    margs = Arguments(
        model_name_or_path=f"opt-{args.model}", context="all",
        neighbor_mode="raw", max_input_length=512, max_output_length=128,
        bf16=on_tpu, use_pallas=on_tpu)
    margs.decoder_only = True
    model, cfg = build_model(margs, vocab_size=50272)
    b = args.batch
    rng = np.random.RandomState(0)
    t = 640
    n_img = 6
    batch = {
        "input_ids": rng.randint(4, 50000, (b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "labels": rng.randint(4, 50000, (b, t)).astype(np.int32),
        "image_positions": np.tile(np.arange(n_img * 4)[None],
                                   (b, 1)).astype(np.int32),
        "images_pooled": rng.randn(b, n_img,
                                   cfg.vision.hidden_size).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = dict(variables["params"])
    mask = trainable_mask(params, "none", False)
    tx = build_optimizer(margs, mask)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)
    key = jax.random.PRNGKey(1)

    def timeit(label, fn, *a, reset=None):
        out = fn(*a)
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
        dt = dt if dt > 0 else tb / args.n2
        print(f"[variant] {label:32s} {dt * 1e3:8.2f} ms", flush=True)
        import gc

        gc.collect()
        jax.clear_caches()
        return dt

    def _drain(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf).astype(jnp.float32))

    if not args.skip_monolithic:
        # (a) monolithic DONATED step (exactly bench.py's)
        step_a = jax.jit(make_train_step(model, tx, True, 512, 1),
                         donate_argnums=(0,))
        st = create_train_state(params, tx)

        def run_a(b_):
            nonlocal st
            st, m = step_a(st, b_, key)
            return m["loss"]

        timeit("monolithic_donated", run_a, batch)
        del step_a

    # (b) split: program 1 = grads+loss, program 2 = donated update
    def loss_fn(p, b_):
        out = model.apply({"params": p}, b_, deterministic=True)
        loss, _ = causal_losses(out["logits"], out["labels"], 512, 1)
        return loss

    grad_prog = jax.jit(jax.value_and_grad(loss_fn))

    @(lambda f: jax.jit(f, donate_argnums=(1,)))
    def update_prog(grads, opt_state, p):
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state

    p2 = jax.device_put(params)
    os2 = tx.init(p2)

    def run_b(b_):
        nonlocal p2, os2
        loss, grads = grad_prog(p2, b_)
        p2, os2 = update_prog(grads, os2, p2)
        return loss

    timeit("split_grad_then_update", run_b, batch)
    del grad_prog, update_prog

    # (c) monolithic donated, grad_clip=0 (drops clip_by_global_norm pass)
    margs_nc = Arguments(**{**vars(margs), "grad_clip": 0.0})
    tx_nc = build_optimizer(margs_nc, mask)
    step_c = jax.jit(make_train_step(model, tx_nc, True, 512, 1),
                     donate_argnums=(0,))
    st_c = create_train_state(jax.device_put(params), tx_nc)

    def run_c(b_):
        nonlocal st_c
        st_c, m = step_c(st_c, b_, key)
        return m["loss"]

    timeit("monolithic_noclip", run_c, batch)
    del step_c

    # (d) monolithic donated without the grad_norm metric
    # fresh buffers: earlier donated variants shared (and deleted) the
    # original params' device buffers — device_put of a live device array
    # is a no-op, so copy through host numpy
    params = jax.tree_util.tree_map(np.asarray, params)
    def step_d_fn(state, b_, rng_):
        gfn = jax.value_and_grad(loss_fn)
        loss, grads = gfn(state.params, b_)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        p = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=p,
                          opt_state=opt_state), loss

    step_d = jax.jit(step_d_fn, donate_argnums=(0,))
    st_d = create_train_state(jax.device_put(params), tx)

    def run_d(b_):
        nonlocal st_d
        st_d, loss = step_d(st_d, b_, key)
        return loss

    timeit("monolithic_nonorm_metric", run_d, batch)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                st_d, loss = step_d(st_d, batch, key)
            float(loss)
        print(f"[trace] written to {args.trace_dir}")


if __name__ == "__main__":
    main()
