"""Convergence soak with mid-run kill+resume (VERDICT r3 item 5).

The reference trains 50 epochs x 10K steps (script/train_generation.sh:27-28,
run_generation.py:384-428); the longest run previously executed here was
~400 steps. This harness runs the REAL CLI (subprocess, the production code
path: threaded loader, cached towers, donated step, orbax checkpoints) at
the BASELINE config-1 shape for thousands of steps and demonstrates:

  1. sustained throughput — per-print-window step time, first vs last
     quartile of the run;
  2. host-RSS stability — /proc polling of the training process;
  3. exact kill+resume replay — run B is SIGKILLed mid-epoch, resumed from
     the periodic --save_every_epochs checkpoint, and every printed loss
     from the resume epoch onward must EQUAL run A's (the dropout stream is
     epoch-indexed and the loader (epoch, pass)-deterministic, so resume is
     a bit-exact replay — cli.py resume block).

Run ON CHIP:  python scripts/soak.py [--epochs 10 --steps 500 --batch 32]
Output: one JSON line (plus progress to stderr); artifacts under --workdir.
"""

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import threading
import time

LOSS_RE = re.compile(r"Epoch: \[(\d+)\]\[ *(\d+)/ *\d+\].*?"
                     r"Loss ([0-9.e+-]+) \(([0-9.e+-]+)\)")
TIME_RE = re.compile(r"Time +([0-9.]+) \( *([0-9.]+)\)")


def cli_cmd(args, run_name, extra=()):
    tiny = "tiny" in args.model
    if args.vocab and not tiny:
        # production-vocab soak (VERDICT r4 missing #4): pad the byte
        # tokenizer's reported vocab so embeddings + logits run at the
        # reference's 50,272 width (train_generation.sh:6-30)
        extra = list(extra) + ["--tokenizer_path", f"byte:{args.vocab}"]
    return [
        sys.executable, "-m", "mmgl_tpu.cli",
        "--model_name_or_path", args.model,
        "--context", "all", "--neighbor_mode", "raw",
        "--cache_neighbor_embeddings", "true",
        "--max_input_length", "32" if tiny else "512",
        "--max_output_length", "16" if tiny else "128",
        "--n_visual_tokens", "4", "--max_image_neighbors", "5",
        "--per_device_train_batch_size", str(args.batch),
        "--per_device_val_batch_size", "8",
        "--epochs", str(args.epochs),
        "--steps_per_epoch", str(args.steps),
        "--val_steps_per_epoch", "2",
        "--grad_accumulation_steps", "1",
        "--print_freq", str(args.print_freq),
        "--learning_rate", "1e-4", "--lr_warmup_steps", "100",
        "--bf16", "false" if tiny else "true",
        "--use_pallas", "false" if tiny else "true",
        "--seed", "0",
        "--save_every_epochs", "1",
        "--dataloader_num_workers", "8", "--prefetch_batches", "8",
        "--log_dir", args.workdir,
        "--wandb_run", run_name,
    ] + list(extra)


def run_watched(cmd, log_path, kill_marker=None, rss_samples=None,
                env=None):
    """Run cmd, tee stdout to log_path; optionally SIGKILL when a stdout
    line matches kill_marker; optionally poll RSS into rss_samples."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    killed = [False]

    def rss_poll():
        while proc.poll() is None:
            try:
                with open(f"/proc/{proc.pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS"):
                            rss_samples.append(
                                (time.time(), int(line.split()[1])))
            except OSError:
                break
            time.sleep(5)

    poller = None
    if rss_samples is not None:
        poller = threading.Thread(target=rss_poll, daemon=True)
        poller.start()

    with open(log_path, "w") as log:
        for line in proc.stdout:
            log.write(line)
            log.flush()
            if kill_marker and kill_marker in line and not killed[0]:
                killed[0] = True
                print(f"[soak] KILLING at marker: {line.strip()}",
                      file=sys.stderr)
                os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    if poller:
        poller.join(timeout=1)
    return proc.returncode, killed[0]


def parse_losses(log_path):
    """{(epoch, step): (loss, loss_avg)} from the CLI's progress lines."""
    out = {}
    times = []
    with open(log_path) as f:
        for line in f:
            m = LOSS_RE.search(line)
            if m:
                out[(int(m.group(1)), int(m.group(2)))] = (
                    float(m.group(3)), float(m.group(4)))
                t = TIME_RE.search(line)
                if t:
                    times.append((int(m.group(1)), int(m.group(2)),
                                  float(t.group(2))))
    return out, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--model", default="opt-125m",
                    help="opt-125m (production soak) or opt-tiny (CPU smoke)")
    ap.add_argument("--print_freq", type=int, default=50)
    ap.add_argument("--vocab", type=int, default=50272,
                    help="pad the byte tokenizer's vocab to this width for "
                         "non-tiny models (0 = native 260)")
    ap.add_argument("--workdir", default="/tmp/mmgl_soak")
    ap.add_argument("--kill_epoch", type=int, default=None,
                    help="epoch whose midpoint kills run B "
                         "(default: epochs//2)")
    ap.add_argument("--resume_only", action="store_true",
                    help="runA.log and runB.log already exist in --workdir "
                         "(e.g. the harness itself was SIGKILLed mid-soak, "
                         "taking run B's whole process tree with it): skip "
                         "straight to the resume phase and verify against "
                         "the existing logs")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    kill_epoch = args.kill_epoch if args.kill_epoch is not None \
        else args.epochs // 2
    # ProgressMeter right-pads the step to the width of the total
    # ("[  6/500]"): build the marker with the same padding, otherwise a
    # mid-width step count never matches and run B completes unkilled
    mid = str(args.steps // 2).rjust(len(str(args.steps)))
    kill_marker = f"Epoch: [{kill_epoch}][{mid}"

    env = dict(os.environ)
    total = args.epochs * args.steps

    if args.resume_only:
        t_a, rss = None, []
        loss_a, times_a = parse_losses(os.path.join(args.workdir,
                                                    "runA.log"))
        assert len(loss_a) >= total // args.print_freq - 2, (
            f"run A printed only {len(loss_a)} loss windows")
        pre, _ = parse_losses(os.path.join(args.workdir, "runB.log"))
        kill_epoch = max(e for e, _ in pre)
    else:
        # ---- run A: uninterrupted, RSS-polled ----
        print(f"[soak] run A: {args.epochs}x{args.steps} steps "
              f"b={args.batch}", file=sys.stderr)
        rss = []
        t0 = time.time()
        rc, _ = run_watched(cli_cmd(args, "soakA"),
                            os.path.join(args.workdir, "runA.log"),
                            rss_samples=rss, env=env)
        t_a = time.time() - t0
        assert rc == 0, f"run A failed rc={rc}"
        loss_a, times_a = parse_losses(
            os.path.join(args.workdir, "runA.log"))
        assert len(loss_a) >= total // args.print_freq - 2, (
            f"run A printed only {len(loss_a)} loss windows")

        # ---- run B: killed mid-epoch, then resumed ----
        print(f"[soak] run B: kill at {kill_marker!r}", file=sys.stderr)
        rc, killed = run_watched(cli_cmd(args, "soakB"),
                                 os.path.join(args.workdir, "runB.log"),
                                 kill_marker=kill_marker, env=env)
        assert killed and rc != 0, f"run B was not killed (rc={rc})"

    print("[soak] run B resume", file=sys.stderr)
    rc, _ = run_watched(cli_cmd(args, "soakB", ["--resume", "soakB_0"]),
                        os.path.join(args.workdir, "runB_resume.log"),
                        rss_samples=rss if args.resume_only else None,
                        env=env)
    assert rc == 0, f"resume failed rc={rc}"
    if args.resume_only:
        # run A's wallclock from its per-epoch summary lines
        ep_re = re.compile(r"Epoch \d+ time: ([0-9.]+)s")
        with open(os.path.join(args.workdir, "runA.log")) as f:
            t_a = sum(float(m.group(1)) for m in map(ep_re.search, f) if m)
    loss_b1, _ = parse_losses(os.path.join(args.workdir, "runB.log"))
    loss_b2, _ = parse_losses(
        os.path.join(args.workdir, "runB_resume.log"))

    # pre-kill prefix must equal run A (same seed, same stream)
    mism_pre = [k for k, v in loss_b1.items()
                if k in loss_a and v != loss_a[k]]
    # post-resume epochs must be an exact replay of run A
    resumed_epochs = sorted({e for e, _ in loss_b2})
    resume_start = min(resumed_epochs)
    mism_post = [k for k, v in loss_b2.items() if loss_a.get(k) != v]
    covered = [k for k in loss_a if k[0] >= resume_start]
    missing = [k for k in covered if k not in loss_b2]

    # throughput / RSS stability over run A (skip epoch 0: compile)
    steady = [t for e, s, t in times_a if e >= 1]
    assert steady, "no steady-state Time windows parsed from run A"
    q = max(1, len(steady) // 4)
    step_first, step_last = (sum(steady[:q]) / q, sum(steady[-q:]) / q)
    rss_kb = [v for _, v in rss]
    qr = max(1, len(rss_kb) // 4)
    rss_first = sum(rss_kb[:qr]) / qr / 1024 if rss_kb else None
    rss_last = sum(rss_kb[-qr:]) / qr / 1024 if rss_kb else None

    ok = not mism_pre and not mism_post and not missing
    print(json.dumps({
        "metric": "soak_kill_resume",
        "value": round(args.batch / (sum(steady) / len(steady)), 2),
        "unit": "sections/s/chip (steady-state over the whole soak)",
        "vs_baseline": None,
        "extra": {
            "total_steps": total, "batch": args.batch,
            "wallclock_runA_s": round(t_a, 1),
            "kill_epoch": kill_epoch, "resume_start_epoch": resume_start,
            "loss_windows_runA": len(loss_a),
            "pre_kill_mismatches": len(mism_pre),
            "post_resume_mismatches": len(mism_post),
            "post_resume_missing_windows": len(missing),
            "exact_replay": ok,
            "step_time_s_first_quartile": round(step_first, 4),
            "step_time_s_last_quartile": round(step_last, 4),
            "rss_mb_first_quartile": round(rss_first, 1),
            "rss_mb_last_quartile": round(rss_last, 1),
            "rss_mb_max": round(max(rss_kb) / 1024, 1) if rss_kb else None,
            # resume_only: RSS polled over the resume process (the only
            # one alive in this invocation), wallclock from runA.log
            "resume_only": args.resume_only,
            # non-tiny soaks pad the byte tokenizer's reported vocab to
            # --vocab (default 50,272 — the production width; the r4 soak
            # ran at the native 260 and left step-time/RSS at the
            # production logits size extrapolated, VERDICT r4 missing #4)
            "vocab_size": (args.vocab if args.vocab and
                           "tiny" not in args.model else 260),
        },
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
