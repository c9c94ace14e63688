"""Measure the T5 train step on chip (the paper's primary LM family).

Config: t5-base, context=section_only, neighbor_mode=raw — the pure
text-to-text summarization recipe (reference: run_generation.py:289-295
builds AutoModelForSeq2SeqLM; optimizer is Adafactor per :321-324).
Timing: two-point host-materialization (see bench.py docstring).

Run ON CHIP:  python scripts/bench_t5.py [--model base] [--batch 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="base")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=25)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize latches the TPU backend; env alone is ignored
        jax.config.update("jax_platforms", "cpu")

    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import count_params, trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import (create_train_state,
                                      make_production_train_step)

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch
    margs = Arguments(
        model_name_or_path=f"t5-{args.model}", context="section_only",
        neighbor_mode="raw", max_input_length=512, max_output_length=128,
        bf16=on_tpu, use_pallas=on_tpu)
    margs.decoder_only = False
    model, cfg = build_model(margs, vocab_size=32128)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(4, 32000,
                                 (b, cfg.max_input_length)).astype(np.int32),
        "attention_mask": np.ones((b, cfg.max_input_length), np.int32),
        "labels": rng.randint(4, 32000,
                              (b, cfg.max_output_length)).astype(np.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = dict(variables["params"])
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))

    mask = trainable_mask(params, "none", False)
    tx = build_optimizer(margs, mask)   # Adafactor for T5 (optim.py)
    state = create_train_state(params, tx)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    step = make_production_train_step(
        model, tx, decoder_only=False,
        max_input_length=cfg.max_input_length, pad_token_id=0)

    st, key = state, jax.random.PRNGKey(1)

    def run(n):
        nonlocal st
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            st, m = step(st, batch, key)
        loss = float(m["loss"])     # host materialization = real sync
        return time.perf_counter() - t0, loss

    run(1)  # compile + warmup
    (ta, _), (tb, loss) = run(args.n1), run(args.n2)
    dt = (tb - ta) / (args.n2 - args.n1)
    print(f"t5-{args.model} b={b}: {dt*1e3:.1f} ms/step, "
          f"{b/dt:.1f} sections/s/chip, params={n_params/1e6:.0f}M, "
          f"loss={loss:.4f}")


if __name__ == "__main__":
    main()
