"""Memory-ceiling probe: OPT-6.7B on ONE 16 GB v5e (VERDICT r3 item 8).

BASELINE configs 3-4 escalate OPT to multi-billion params with PEFT
(freeze_lm + LoRA / flamingo), where only adapters train. The question this
probe answers BY MEASUREMENT: does a 6.7B PEFT train step fit a single
v5e's 16 GB HBM, and at what throughput — or exactly where does it OOM and
what sharding fixes it.

The memory equation (b = batch, T = 640 tokens, d = 4096, L = 32,
V = 50272, bf16 = 2 bytes):
  params (bf16)                 2 * 6.86e9            = 13.72 GB
  LoRA adapters + opt state     ~3 * 2 * r*(d+d)*4L*2 =  ~0.05 GB (r=16)
  logits (fp32 CE path)         b*T*V*4               =  0.129 GB/ex
  logits (fused_ce bf16)        b*T*V*2               =  0.064 GB/ex
  activations w/ remat          ~b*T*d*L*2 (layer in) =  0.336 GB @ b=2
so bf16 params + b=2 remat'd activations + bf16 logits ~ 14.2 GB -> the
probe attempts b=1/2/4 and prints the first fitting configuration.

The chunked-CE attempts (spec 4th field) fold the head into the loss
(train/losses.py chunked_ce): the b*T*V logits residual drops to b*T*V/n
transient per scan slice, freeing 0.064 GB/ex (bf16) — the largest
per-example term — at +1 vocab matmul of backward recompute.

Run ON CHIP:  python scripts/probe_67b.py [--size 6.7b] [--peft lora]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def attempt(size, peft, b, remat, fused_ce, chunked=0):
    import jax

    from mmgl_tpu.config import Arguments
    from mmgl_tpu.models.factory import build_model
    from mmgl_tpu.peft import trainable_mask
    from mmgl_tpu.train.optim import build_optimizer
    from mmgl_tpu.train.steps import (create_train_state,
                                      make_production_train_step)

    margs = Arguments(
        model_name_or_path=f"opt-{size}", context="section_only",
        neighbor_mode="raw", max_input_length=512, max_output_length=128,
        bf16=True, use_pallas=True, param_dtype="bfloat16",
        peft_type=peft, freeze_lm=True, lora_r=16, lora_alpha=32,
        remat=remat, fused_ce=fused_ce, chunked_ce=chunked)
    margs.decoder_only = True
    model, cfg = build_model(margs, vocab_size=50272)

    rng = np.random.RandomState(0)
    t = cfg.max_input_length + cfg.max_output_length
    batch = {
        "input_ids": rng.randint(4, 50000, (b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "labels": rng.randint(4, 50000, (b, t)).astype(np.int32),
    }
    # init on host with eval_shape-sized zeros is wasteful at 6.7B; init
    # directly on device (one pass) — jit makes init allocate-once
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = dict(variables["params"])
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    mask = trainable_mask(params, peft, True)
    n_train = sum(int(np.prod(x.shape)) for x, m in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask))
        if m)
    tx = build_optimizer(margs, mask)
    state = create_train_state(params, tx)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    step = make_production_train_step(
        model, tx, decoder_only=True, max_input_length=cfg.max_input_length,
        pad_token_id=1, trainable_mask=mask, fused_ce=fused_ce,
        chunked_ce=chunked)
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, key)
    loss = float(m["loss"])
    assert np.isfinite(loss)

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        mlast = None
        for _ in range(n):
            state, mlast = step(state, batch, key)
        float(mlast["loss"])
        return time.perf_counter() - t0

    ta, tb = run(3), run(10)
    dt = (tb - ta) / 7
    if dt <= 0:
        dt = tb / 10
    stats = jax.devices()[0].memory_stats() or {}
    return {
        "batch": b, "remat": remat, "fused_ce": fused_ce,
        "chunked_ce": chunked,
        "params_b": round(n_params / 1e9, 3),
        "trainable_m": round(n_train / 1e6, 2),
        "step_time_ms": round(dt * 1e3, 1),
        "sections_per_sec": round(b / dt, 2),
        "loss": round(loss, 4),
        "hbm_peak_gb": round(
            stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2) or None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="6.7b")
    ap.add_argument("--peft", default="lora")
    ap.add_argument("--configs",
                    default="1:1:0,2:1:0,4:1:0,4:0:0,4:0:0:8,8:1:0:8",
                    help="comma list of batch:remat:fused_ce[:chunked] "
                         "attempts (chunked = vocab-chunked CE n_chunks: "
                         "the (B,T,V) logits residual disappears — the "
                         "6.7B memory equation's largest per-example term)")
    ap.add_argument("--one", default=None, help="internal: run one attempt "
                    "in-process and print its JSON")
    args = ap.parse_args()

    if args.one:
        import jax
        assert jax.default_backend() == "tpu", "chip-only probe"
        parts = [int(x) for x in args.one.split(":")]
        b, remat, fused = parts[:3]
        chunked = parts[3] if len(parts) > 3 else 0
        print(json.dumps(attempt(args.size, args.peft, b, bool(remat),
                                 bool(fused), chunked)))
        return

    # one subprocess per attempt: an OOM'd attempt must not leave dead
    # allocations (or a poisoned allocator) behind for the next one
    import subprocess
    results, first_ok = [], None

    def summary():
        return json.dumps({
            "metric": f"opt{args.size}_train_sections_per_sec_per_chip",
            "value": (first_ok or {}).get("sections_per_sec"),
            "unit": "sections/s/chip",
            "vs_baseline": None,
            "extra": {"peft": args.peft, "attempts": results},
        })

    for spec in args.configs.split(","):
        parts = [int(x) for x in spec.split(":")]
        b, remat, fused = parts[:3]
        chunked = parts[3] if len(parts) > 3 else 0
        print(f"[probe] attempting b={b} remat={remat} fused_ce={fused} "
              f"chunked={chunked}", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, __file__, "--size", args.size,
             "--peft", args.peft, "--one", spec],
            capture_output=True, text=True, timeout=3600)
        if proc.returncode == 0 and proc.stdout.strip():
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            results.append(r)
            if first_ok is None:
                first_ok = r
            print(f"[probe] OK: {r}", file=sys.stderr)
        else:
            tail = (proc.stderr or "").splitlines()
            msg = next((l for l in reversed(tail)
                        if "RESOURCE_EXHAUSTED" in l or "Error" in l),
                       tail[-1] if tail else "no output")[:300]
            results.append({"batch": b, "remat": bool(remat),
                            "fused_ce": bool(fused), "chunked_ce": chunked,
                            "error": msg})
            print(f"[probe] FAIL: {msg}", file=sys.stderr)
        # incremental scoreboard line: an outer `timeout` mid-queue must
        # still leave a parseable (partial) summary for the harvester,
        # which reads the LAST JSON line of the log
        print(summary(), flush=True)


if __name__ == "__main__":
    main()
