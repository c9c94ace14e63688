"""End-to-end CLI smoke: tiny model, synthetic corpus, train + eval + test."""

import os
import re

import numpy as np
import pytest

from mmgl_tpu.config import Arguments
from mmgl_tpu.cli import run_training, first_period_truncate


def test_fp16_maps_to_fp32():
    """SURVEY Q6: the reference's --fp16 actually trains fp32; we reproduce
    that documented mapping unless bf16 is explicitly requested."""
    import jax.numpy as jnp

    from mmgl_tpu.models.factory import build_fusion_config

    args = Arguments(model_name_or_path="opt-tiny", fp16=True)
    assert args.compute_dtype == "float32"
    cfg = build_fusion_config(args, vocab_size=64)
    assert cfg.opt.dtype == jnp.float32

    args_bf16 = Arguments(model_name_or_path="opt-tiny", bf16=True)
    cfg = build_fusion_config(args_bf16, vocab_size=64)
    assert cfg.opt.dtype == jnp.bfloat16


def test_mixed_token_counts_rejected():
    from mmgl_tpu.models.factory import build_fusion_config

    args = Arguments(model_name_or_path="opt-tiny", neighbor_mode="embedding",
                     n_text_tokens=4, n_visual_tokens=2)
    with pytest.raises(ValueError, match="n_text_tokens"):
        build_fusion_config(args, vocab_size=64)


def test_first_period_truncate():
    assert first_period_truncate("hello world. more") == "hello world"
    assert first_period_truncate("a. b") == "a. b"  # idx <= 5: keep
    assert first_period_truncate("no period") == "no period"


def test_run_training_end_to_end(tmp_path):
    args = Arguments(
        model_name_or_path="opt-tiny", context="section_only",
        neighbor_mode="raw", max_input_length=32, max_output_length=16,
        per_device_train_batch_size=2, per_device_val_batch_size=2,
        epochs=1, steps_per_epoch=2, val_steps_per_epoch=1,
        grad_accumulation_steps=1, print_freq=1, learning_rate=1e-3,
        lr_warmup_steps=2, log_dir=str(tmp_path), use_pallas=False, seed=0,
        dataloader_num_workers=1, prefetch_batches=2)
    results = run_training(args)
    # final test pass produced the full metric set
    for key in ("loss", "bleu1", "bleu4", "cider", "rouge1_fmeasure",
                "rougeLsum_fmeasure"):
        assert key in results, key
        assert np.isfinite(results[key])
    # best checkpoint was written
    assert os.path.exists(os.path.join(tmp_path, "default_0", "ckpt"))


def test_run_training_zero1_resume(tmp_path):
    """--zero1 end to end: train over a dp mesh with data-sharded moments,
    then resume — apply_zero1 must re-apply after the orbax restore."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    common = dict(
        model_name_or_path="opt-tiny", context="section_only",
        neighbor_mode="raw", max_input_length=32, max_output_length=16,
        per_device_train_batch_size=2, per_device_val_batch_size=2,
        epochs=1, steps_per_epoch=2, val_steps_per_epoch=1,
        grad_accumulation_steps=1, print_freq=1, learning_rate=1e-3,
        lr_warmup_steps=2, log_dir=str(tmp_path), use_pallas=False, seed=0,
        dataloader_num_workers=1, prefetch_batches=2,
        mesh_shape=(8, 1), zero1=True, fsdp=True)
    results = run_training(Arguments(wandb_run="z1", **common))
    assert np.isfinite(results["loss"])

    # resume with epochs=2 so start_epoch = saved_epoch + 1 leaves a real
    # training epoch to run: the restored ZeRO-1 state must take train steps
    # (apply_zero1 re-applied post-restore), not just evaluate.
    results = run_training(Arguments(wandb_run="z1b", resume="z1_0",
                                     **dict(common, epochs=2)))
    assert np.isfinite(results["loss"])
    assert results.get("train_updates", 0) > 0, \
        "resumed ZeRO-1 run took no training steps"

    # cross-topology restore: the dp8 fsdp/zero1-sharded checkpoint loads
    # into a single-device evaluate-only run (train distributed, test local)
    small = dict(common, mesh_shape=(1, 1), zero1=False, fsdp=False)
    results = run_training(Arguments(wandb_run="z1c", test=True,
                                     resume="z1_0", **small))
    assert np.isfinite(results["loss"])


def test_cli_test_flag_with_resume(tmp_path):
    """--test: evaluate-only with a resumed checkpoint (the reference's
    test path crashes on an undefined epoch + missing generate, Q5;
    ours runs the greedy-decode eval and returns the metric set)."""
    common = dict(
        model_name_or_path="opt-tiny", context="section_only",
        neighbor_mode="raw", max_input_length=32, max_output_length=16,
        per_device_train_batch_size=2, per_device_val_batch_size=2,
        epochs=1, steps_per_epoch=2, val_steps_per_epoch=1,
        grad_accumulation_steps=1, print_freq=1, learning_rate=1e-3,
        lr_warmup_steps=2, log_dir=str(tmp_path), use_pallas=False, seed=0,
        dataloader_num_workers=1, prefetch_batches=2)
    run_training(Arguments(wandb_run="trainrun", **common))

    results = run_training(Arguments(wandb_run="testrun", test=True,
                                     resume="trainrun_0", **common))
    for key in ("loss", "bleu4", "cider"):
        assert key in results and np.isfinite(results[key]), key


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train import checkpoints
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import create_train_state

    args = Arguments(model_name_or_path="opt-tiny", max_input_length=16,
                     max_output_length=8, use_pallas=False)
    model, cfg = build_model(args, vocab_size=64)
    batch = {"input_ids": np.ones((1, 24), np.int32),
             "attention_mask": np.ones((1, 24), np.int32),
             "labels": np.ones((1, 24), np.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    mask = trainable_mask(variables["params"], "none", False)
    tx = build_optimizer(args, mask)
    state = create_train_state(dict(variables["params"]), tx)

    path = str(tmp_path / "ckpt")
    checkpoints.save_checkpoint(path, state, epoch=3, best_acc1=0.5)
    restored = checkpoints.restore_checkpoint(path)
    assert int(restored["epoch"]) == 3
    assert float(restored["best_acc1"]) == pytest.approx(0.5)

    merged = checkpoints.merge_restored_params(dict(state.params),
                                               restored["params"])
    a = state.params["lm"]["decoder"]["embed_tokens"]["embedding"]
    b = merged["lm"]["decoder"]["embed_tokens"]["embedding"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert checkpoints.restore_checkpoint(str(tmp_path / "missing")) is None


def test_resume_continues_trajectory(tmp_path):
    """Save mid-training, restore into a FRESH model+optimizer, take a step,
    and match the uninterrupted trajectory (VERDICT r1 weak #3: restored
    opt_state must come back as typed optax containers, not plain dicts)."""
    import jax

    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train import checkpoints
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import create_train_state, make_train_step

    args = Arguments(model_name_or_path="opt-tiny", max_input_length=16,
                     max_output_length=8, use_pallas=False, learning_rate=1e-2,
                     lr_warmup_steps=1, grad_clip=1.0)

    def fresh():
        model, cfg = build_model(args, vocab_size=64)
        rng = np.random.RandomState(0)
        batch = {"input_ids": rng.randint(2, 60, (2, 24)).astype(np.int32),
                 "attention_mask": np.ones((2, 24), np.int32),
                 "labels": rng.randint(2, 60, (2, 24)).astype(np.int32)}
        variables = model.init(jax.random.PRNGKey(0), batch)
        mask = trainable_mask(variables["params"], "none", False)
        tx = build_optimizer(args, mask)
        state = create_train_state(dict(variables["params"]), tx)
        step = jax.jit(make_train_step(model, tx, decoder_only=True,
                                       max_input_length=16, pad_token_id=1))
        return state, step, batch

    key = jax.random.PRNGKey(7)
    # uninterrupted: 3 steps
    state, step, batch = fresh()
    for _ in range(2):
        state, _ = step(state, batch, key)
    path = str(tmp_path / "ckpt")
    checkpoints.save_checkpoint(path, state, epoch=1, best_acc1=0.1)
    state, _ = step(state, batch, key)
    expected = state.params

    # restart: fresh everything, typed restore, one step
    state2, step2, batch2 = fresh()
    restored = checkpoints.restore_checkpoint(path, state=state2)
    state2 = state2.replace(
        params=checkpoints.merge_restored_params(dict(state2.params),
                                                 restored["params"]),
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]))
    state2, _ = step2(state2, batch2, key)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        expected, state2.params)


def test_cross_attention_mode_alias():
    """Q3: --neighbor_mode cross_attention (the reference's MPT gate) must
    mean embedding-style neighbor batches, not silently fall back to raw."""
    args = Arguments(model_name_or_path="mpt-tiny",
                     neighbor_mode="cross_attention")
    assert args.neighbor_mode == "embedding"


def test_debug_dump_forensics_hook(tmp_path, monkeypatch):
    """MMGL_DEBUG_DUMP writes per-update (key, batch-md5, param-md5, loss)
    lines — the replay-divergence forensics used to root-cause the r4 soak.
    Two identical runs must produce identical dumps."""
    dumps = []
    for i in range(2):
        dump = tmp_path / f"dump{i}.txt"
        monkeypatch.setenv("MMGL_DEBUG_DUMP", str(dump))
        args = Arguments(
            model_name_or_path="opt-tiny", context="section_only",
            neighbor_mode="raw", max_input_length=32, max_output_length=16,
            per_device_train_batch_size=2, per_device_val_batch_size=2,
            epochs=1, steps_per_epoch=3, val_steps_per_epoch=1,
            grad_accumulation_steps=1, print_freq=1, learning_rate=1e-3,
            lr_warmup_steps=2, log_dir=str(tmp_path / f"run{i}"),
            use_pallas=False, seed=0,
            dataloader_num_workers=1, prefetch_batches=2)
        run_training(args)
        lines = dump.read_text().strip().splitlines()
        assert len(lines) == 6   # 3 updates x (inputs line + loss line)
        assert "key=" in lines[0] and "params=" in lines[0]
        assert re.search(r"loss=\d+\.\d+e[+-]\d+$", lines[1]), lines[1]
        dumps.append(lines)
    assert dumps[0] == dumps[1], "identical runs produced different dumps"


def test_rss_watchdog_reexec_exact(tmp_path):
    """--rss_watchdog_gb: when host RSS exceeds the bound at an epoch
    boundary, the CLI checkpoints and re-execs itself, resuming at the next
    epoch. The restart must be an exact replay: the forensics dump of the
    re-exec'd run matches an uninterrupted run update-for-update. This is
    the production mitigation for hosts whose device-transfer layer leaks
    RSS per transfer (measured: scripts/probe_rss_leak.py)."""
    import subprocess
    import sys

    def run(name, extra, dump):
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   MMGL_DEBUG_DUMP=str(dump))
        cmd = [
            sys.executable, "-m", "mmgl_tpu.cli",
            "--model_name_or_path", "opt-tiny",
            "--context", "section_only", "--neighbor_mode", "raw",
            "--max_input_length", "32", "--max_output_length", "16",
            "--per_device_train_batch_size", "2",
            "--per_device_val_batch_size", "2",
            "--epochs", "2", "--steps_per_epoch", "2",
            "--val_steps_per_epoch", "1", "--grad_accumulation_steps", "1",
            "--print_freq", "1", "--learning_rate", "1e-3",
            "--lr_warmup_steps", "2", "--use_pallas", "false", "--seed", "0",
            "--dataloader_num_workers", "1", "--prefetch_batches", "2",
            "--log_dir", str(tmp_path / name), "--wandb_run", name,
        ] + extra
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=600)
        assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
        return out.stdout

    dump_a = tmp_path / "dump_a.txt"
    run("plain", [], dump_a)

    dump_b = tmp_path / "dump_b.txt"
    # 1e-3 GB: any real process exceeds it, so the watchdog fires at the
    # first eligible boundary (after epoch 0; never after the final epoch)
    out_b = run("watched", ["--rss_watchdog_gb", "0.001"], dump_b)
    assert out_b.count("[rss-watchdog] RSS") == 1, out_b[-2000:]
    assert "re-exec'ing to reclaim host memory" in out_b
    # the re-exec'd image ran the second epoch and the final test
    assert "Epoch: [1]" in out_b

    a = dump_a.read_text().strip().splitlines()
    b = dump_b.read_text().strip().splitlines()
    assert len(a) == 8   # 2 epochs x 2 updates x (inputs + loss) lines
    # Compare every value-bearing field (rng key, batch bytes, param bytes,
    # step counter, losses). The `sig=` arg-signature field is EXPECTED to
    # differ on the first post-resume update only: there the state carries
    # the restored/canonicalized (fresh-path) jit signature while the
    # uninterrupted run's state is a step output — the two signatures map to
    # the same two cached executables every run compiles (fresh-init then
    # step-output), so values match bitwise (checkpoints._canonicalize_restored).
    strip = lambda ls: [re.sub(r"sig=\w+ ", "", l) for l in ls]
    assert strip(a) == strip(b), \
        "watchdog re-exec diverged from the uninterrupted run"
