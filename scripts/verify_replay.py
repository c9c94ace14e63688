"""Checkpoint-replay fidelity verification (r4 soak forensics, productized).

Three escalating checks of the exact-replay contract
(DIVERGENCES.md "Kill+resume replay semantics"):

  [1] roundtrip   — save mid-run, restore, compare params + every
                    optimizer-state leaf BITWISE against a host snapshot.
  [2] same-proc   — after the roundtrip, replay 10 steps from the restored
                    state and from the live state with identical keys/batch:
                    losses must be equal to every printed digit.
  [3] cross-proc  — phase A (this process) saves + records replay losses;
                    re-running with --phase b restores in a FRESH process
                    and must reproduce them. With the persistent XLA
                    compilation cache (cli.py default) the fresh process
                    runs the same executable, which also pins the TPU rbg
                    dropout bit-stream (the r4 soak's root cause).

Run ON CHIP (or CPU with JAX_PLATFORMS=cpu):
  python scripts/verify_replay.py            # [1] + [2] + phase A of [3]
  python scripts/verify_replay.py --phase b  # [3] fresh-process replay
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def build(on_cpu_ok=True):
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import (create_train_state,
                                      make_production_train_step)

    on_tpu = jax.default_backend() == "tpu"
    size = "125m" if on_tpu else "tiny"
    il, ol = (512, 128) if on_tpu else (32, 16)
    margs = Arguments(
        model_name_or_path=f"opt-{size}", context="all", neighbor_mode="raw",
        max_input_length=il, max_output_length=ol,
        n_visual_tokens=4, max_image_neighbors=5,
        learning_rate=1e-4, lr_warmup_steps=100,
        bf16=on_tpu, use_pallas=on_tpu)
    margs.decoder_only = True
    model, cfg = build_model(margs, vocab_size=260)

    b = 8 if on_tpu else 2
    rng = np.random.RandomState(0)
    t = cfg.max_input_length + cfg.max_output_length
    n_img = 1 + cfg.max_image_neighbors
    batch = {
        "input_ids": rng.randint(4, 250, (b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "labels": rng.randint(4, 250, (b, t)).astype(np.int32),
        "image_positions": np.tile(
            np.arange(n_img * cfg.n_visual_tokens)[None],
            (b, 1)).astype(np.int32),
        "images_pooled": rng.randn(
            b, n_img, cfg.vision.hidden_size).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = dict(variables["params"])
    mask = trainable_mask(params, margs.peft_type, margs.freeze_lm)
    tx = build_optimizer(margs, mask)
    state = create_train_state(params, tx)
    step = make_production_train_step(
        model, tx, decoder_only=True, max_input_length=cfg.max_input_length,
        pad_token_id=1, grad_accumulation_steps=1)
    return jax, step, state, jax.device_put(batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="a", choices=["a", "b"])
    ap.add_argument("--ckpt", default="/tmp/mmgl_verify_replay")
    args = ap.parse_args()

    import jax.numpy as jnp

    from mmgl_tpu.train import checkpoints
    from mmgl_tpu.train.steps import dropout_stream_key

    jax, step, state, batch = build()
    losses_path = args.ckpt + ".losses.json"

    if args.phase == "b":
        restored = checkpoints.restore_checkpoint(args.ckpt, state=state,
                                                  keep_towers=True)
        assert restored is not None, f"run phase a first ({args.ckpt})"
        state = state.replace(
            params=checkpoints.merge_restored_params(dict(state.params),
                                                     restored["params"]),
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]))
        losses = []
        for i in range(10, 20):
            state, m = step(state, batch, dropout_stream_key(i))
            losses.append(float(m["loss"]))
        ref = json.load(open(losses_path))
        d = max(abs(a - b) for a, b in zip(ref, losses))
        print(f"[3] cross-process replay max|delta|={d} -> "
              f"{'EXACT' if d == 0 else 'DIVERGES'}")
        sys.exit(0 if d == 0 else 1)

    # phase A
    for i in range(10):
        state, m = step(state, batch, dropout_stream_key(i))
    float(m["loss"])
    snap = jax.tree_util.tree_map(np.asarray, {
        "params": dict(state.params), "opt_state": state.opt_state})
    checkpoints.save_checkpoint(args.ckpt, state, epoch=0, best_acc1=0.0,
                                keep_towers=True)

    restored = checkpoints.restore_checkpoint(args.ckpt, state=state,
                                              keep_towers=True)
    state2 = state.replace(
        params=checkpoints.merge_restored_params(dict(state.params),
                                                 restored["params"]),
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]))

    bad = 0
    for a, b in zip(jax.tree_util.tree_leaves(snap["params"]),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray,
                                               dict(state2.params)))):
        if a.dtype != b.dtype or not np.array_equal(a, b):
            bad += 1
    n_opt = len(jax.tree_util.tree_leaves(snap["opt_state"]))
    bad_o = sum(
        1 for a, b in zip(
            jax.tree_util.tree_leaves(snap["opt_state"]),
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, state2.opt_state)))
        if np.asarray(a).dtype != np.asarray(b).dtype
        or not np.array_equal(np.asarray(a), np.asarray(b)))
    print(f"[1] roundtrip bitwise: params "
          f"{'OK' if bad == 0 else f'{bad} leaves differ'}; "
          f"opt_state ({n_opt} leaves) "
          f"{'OK' if bad_o == 0 else f'{bad_o} leaves differ'}")

    la, lb = [], []
    sa, sb = state, state2
    for i in range(10, 20):
        sa, ma = step(sa, batch, dropout_stream_key(i))
        sb, mb = step(sb, batch, dropout_stream_key(i))
        la.append(float(ma["loss"]))
        lb.append(float(mb["loss"]))
    d = max(abs(a - b) for a, b in zip(la, lb))
    print(f"[2] same-process replay max|delta|={d} -> "
          f"{'EXACT' if d == 0 else 'DIVERGES'}")
    json.dump(la, open(losses_path, "w"))
    print(f"phase A losses recorded; now run: "
          f"python scripts/verify_replay.py --phase b")
    sys.exit(0 if bad == 0 and bad_o == 0 and d == 0 else 1)


if __name__ == "__main__":
    main()
