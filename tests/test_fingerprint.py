"""Executable-fingerprint detection of replay breakage (VERDICT r4 weak #4).

Exact kill+resume replay depends on the resumed process compiling the
IDENTICAL executable (the TPU rbg dropout stream is per-executable — the r4
soak root-cause). The fingerprint hashes the inputs to XLA's persistent-cache
key (lowered StableHLO + jax version + backend + device kind + flag env); a
resume whose fingerprint differs from the checkpoint's sidecar is loudly
flagged instead of silently replaying a different trajectory.
"""

import json
import os

import jax
import numpy as np
import pytest

from mmgl_tpu.config import Arguments
from mmgl_tpu.cli import run_training
from mmgl_tpu.train import checkpoints


def _tiny_step():
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import create_train_state, make_train_step

    args = Arguments(model_name_or_path="opt-tiny", max_input_length=16,
                     max_output_length=8, use_pallas=False)
    model, _ = build_model(args, vocab_size=64)
    batch = {"input_ids": np.ones((2, 24), np.int32),
             "attention_mask": np.ones((2, 24), np.int32),
             "labels": np.ones((2, 24), np.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    mask = trainable_mask(variables["params"], "none", False)
    tx = build_optimizer(args, mask)
    state = create_train_state(dict(variables["params"]), tx)
    step = jax.jit(make_train_step(model, tx, decoder_only=True,
                                   max_input_length=16, pad_token_id=1))
    return step, state, batch


def test_fingerprint_deterministic_and_shape_sensitive():
    step, state, batch = _tiny_step()
    key = jax.random.PRNGKey(3)
    fp1 = checkpoints.executable_fingerprint(step, state, batch, key)
    fp2 = checkpoints.executable_fingerprint(step, state, batch, key)
    assert fp1["hash"] == fp2["hash"]
    assert fp1["jax_version"] == jax.__version__

    # a different batch shape lowers a different program -> different hash
    batch_wide = {k: np.concatenate([v, v], axis=0) for k, v in batch.items()}
    fp3 = checkpoints.executable_fingerprint(step, state, batch_wide, key)
    assert fp3["hash"] != fp1["hash"]


def test_fingerprint_sidecar_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt")
    info = {"hash": "deadbeefcafe0123", "jax_version": "x", "backend": "cpu",
            "device_kind": "cpu", "xla_flags": "", "libtpu_init_args": ""}
    checkpoints.save_fingerprint(path, info)
    assert checkpoints.load_fingerprint(path) == info
    assert checkpoints.load_fingerprint(str(tmp_path / "missing")) is None


def test_resume_detects_changed_executable(tmp_path, capsys):
    """Train + save, tamper the checkpoint's fingerprint sidecar (standing in
    for a jax upgrade / flag change between runs), resume: the run must warn
    and log replay/executable_match=0 — not silently claim exact replay."""
    common = dict(
        model_name_or_path="opt-tiny", context="section_only",
        neighbor_mode="raw", max_input_length=32, max_output_length=16,
        per_device_train_batch_size=2, per_device_val_batch_size=2,
        steps_per_epoch=2, val_steps_per_epoch=1,
        grad_accumulation_steps=1, print_freq=1, learning_rate=1e-3,
        lr_warmup_steps=2, log_dir=str(tmp_path), use_pallas=False, seed=0,
        dataloader_num_workers=1, prefetch_batches=2)
    run_training(Arguments(wandb_run="fp", epochs=1, **common))

    fp_path = os.path.join(str(tmp_path), "fp_0", "ckpt") + ".fp.json"
    assert os.path.exists(fp_path), "training did not write the sidecar"
    info = json.load(open(fp_path))
    assert info["hash"] not in ("", "unavailable")

    # matched resume first: flag must be 1
    logged = {}
    run_training(Arguments(wandb_run="fp_ok", resume="fp_0", epochs=2,
                           **common),
                 log_fn=lambda s, _: logged.update(s))
    assert logged.get("replay/executable_match") == 1.0
    out = capsys.readouterr().out
    assert "NOT an exact replay" not in out

    # tampered sidecar: flag must be 0 and the warning printed
    info["hash"] = "0000000000000000"
    json.dump(info, open(fp_path, "w"))
    logged = {}
    run_training(Arguments(wandb_run="fp_bad", resume="fp_0", epochs=2,
                           **common),
                 log_fn=lambda s, _: logged.update(s))
    assert logged.get("replay/executable_match") == 0.0
    out = capsys.readouterr().out
    assert "NOT an exact replay" in out
