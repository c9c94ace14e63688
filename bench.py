"""Throughput benchmark — prints ONE JSON line.

Metric: train sections/sec/chip on the reference's launch configuration
family (script/train_generation.sh: OPT, task=section, context=all,
neighbor_mode=raw — text + per-section CLIP image context). Measured on the
real attached TPU with a jitted train step (bf16 compute, Pallas fused
attention) in the framework's production data flow:

  * images travel host->device as uint8, CLIP-normalized on device
  * frozen-tower outputs are cached (--cache_neighbor_embeddings): the step
    consumes pooled CLIP features (identical math — the towers are frozen and
    the reference recomputes them every step, SURVEY §3.2 hot loop 3)

`--variant uncached` measures the reference-shaped step that re-encodes every
image every step (still uint8 transfer).

vs_baseline: the reference publishes no numbers (BASELINE.md). The divisor is
a documented engineering estimate of the reference stack's per-GPU throughput
for OPT-125M at this config on an A100-80GB (fp32, per SURVEY Q6 the --fp16
flag casts to fp32): ~20 sections/sec/chip. Replace with a measured number
when a GPU baseline run exists.
"""

import argparse
import json
import time

import numpy as np

A100_REFERENCE_SECTIONS_PER_SEC = 20.0  # documented estimate, see docstring


def build(variant: str, quick: bool, batch: int):
    import jax

    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import create_train_state, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    size = "tiny" if quick else "125m"
    margs = Arguments(
        model_name_or_path=f"opt-{size}", context="all", neighbor_mode="raw",
        max_input_length=64 if quick else 512,
        max_output_length=16 if quick else 128,
        n_visual_tokens=4, max_image_neighbors=5,
        bf16=on_tpu, use_pallas=on_tpu)
    model, cfg = build_model(margs, vocab_size=50272)

    image_size = 32 if quick else 224
    b = batch if not quick else 2
    rng = np.random.RandomState(0)
    t = cfg.max_input_length + cfg.max_output_length
    n_img = 1 + cfg.max_image_neighbors
    tower_hidden = cfg.vision.hidden_size
    batch_np = {
        "input_ids": rng.randint(4, 50000, (b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "labels": rng.randint(4, 50000, (b, t)).astype(np.int32),
        "image_positions": np.tile(
            np.arange(n_img * cfg.n_visual_tokens)[None], (b, 1)
        ).astype(np.int32),
    }
    init_batch = dict(batch_np)
    init_batch["images"] = rng.randint(
        0, 256, (b, n_img, 3, image_size, image_size)).astype(np.uint8)
    init_batch["images_valid"] = np.ones((b, n_img), np.int32)
    if variant == "cached":
        batch_np["images_pooled"] = rng.randn(
            b, n_img, tower_hidden).astype(np.float32)
    else:
        batch_np["images"] = init_batch["images"]
        batch_np["images_valid"] = init_batch["images_valid"]

    variables = model.init(jax.random.PRNGKey(0), init_batch)
    mask = trainable_mask(variables["params"], margs.peft_type,
                          margs.freeze_lm)
    tx = build_optimizer(margs, mask)
    state = create_train_state(dict(variables["params"]), tx)
    step = jax.jit(make_train_step(
        model, tx, decoder_only=True, max_input_length=cfg.max_input_length,
        pad_token_id=1, grad_accumulation_steps=1), donate_argnums=(0,))
    return step, state, batch_np, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny model + short timing loop (CI smoke)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variant", choices=("cached", "uncached"),
                    default="cached")
    args = ap.parse_args()

    import jax

    step, state, batch, b = build(args.variant, args.quick, args.batch)
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)  # compile
    jax.block_until_ready(m["loss"])

    steps = args.steps if not args.quick else 3
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, key)  # host batch each step, like training
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / steps

    n_chips = jax.device_count()
    sections_per_sec_per_chip = b / dt / n_chips
    print(json.dumps({
        "metric": "train_sections_per_sec_per_chip",
        "value": round(sections_per_sec_per_chip, 3),
        "unit": "sections/s/chip",
        "vs_baseline": round(
            sections_per_sec_per_chip / A100_REFERENCE_SECTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
