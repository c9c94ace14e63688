"""On-chip demonstration that --rss_watchdog_gb bounds the tunnel-client
transfer leak (scripts/probe_rss_leak.py, DIVERGENCES.md close-out).

Runs the production-shaped CLI (opt-125m, padded 50,272 vocab, b=32) with a
watchdog threshold low enough to fire at the first epoch boundary, polls
/proc/<pid> RSS across the whole run — os.execv keeps the PID, so one
poller sees both process images — and reports the RSS immediately before
the re-exec vs the post-restart trough, plus the loss continuity across
the boundary (the resumed epoch must continue the trajectory).

Run ON CHIP:  python scripts/probe_watchdog.py [--epochs 2 --steps 300
              --batch 32 --watchdog_gb 2.0]
Output: one JSON line {"metric": "rss_watchdog_demo", ...}.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time

WD_RE = re.compile(r"\[rss-watchdog\] RSS ([0-9.]+) GB .* re-exec'ing")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--watchdog_gb", type=float, default=2.0)
    ap.add_argument("--vocab", type=int, default=50272)
    ap.add_argument("--workdir", default="/tmp/mmgl_wd_demo")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    cmd = [
        sys.executable, "-m", "mmgl_tpu.cli",
        "--model_name_or_path", "opt-125m",
        "--context", "all", "--neighbor_mode", "raw",
        "--cache_neighbor_embeddings", "true",
        "--max_input_length", "512", "--max_output_length", "128",
        "--n_visual_tokens", "4", "--max_image_neighbors", "5",
        "--per_device_train_batch_size", str(args.batch),
        "--per_device_val_batch_size", "8",
        "--epochs", str(args.epochs),
        "--steps_per_epoch", str(args.steps),
        "--val_steps_per_epoch", "2",
        "--print_freq", "50", "--learning_rate", "1e-4",
        "--lr_warmup_steps", "100", "--bf16", "true", "--use_pallas", "true",
        "--seed", "0", "--save_every_epochs", "1",
        "--dataloader_num_workers", "8", "--prefetch_batches", "8",
        "--tokenizer_path", f"byte:{args.vocab}",
        "--log_dir", args.workdir, "--wandb_run", "wd",
        "--rss_watchdog_gb", str(args.watchdog_gb),
    ]

    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    rss = []  # (t, MB)

    def poll():
        while proc.poll() is None:
            try:
                with open(f"/proc/{proc.pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS"):
                            rss.append((time.time(),
                                        int(line.split()[1]) / 1024.0))
            except OSError:
                break
            time.sleep(2)

    threading.Thread(target=poll, daemon=True).start()

    reexec_times, reexec_rss, losses = [], [], []
    log_path = os.path.join(args.workdir, "wd_demo.log")
    loss_re = re.compile(r"Epoch: \[(\d+)\]\[ *(\d+)/ *\d+\].*?"
                         r"Loss ([0-9.e+-]+)")
    with open(log_path, "w") as log:
        for line in proc.stdout:
            log.write(line)
            log.flush()
            m = WD_RE.search(line)
            if m:
                reexec_times.append(time.time())
                reexec_rss.append(float(m.group(1)) * 1024.0)
                print(f"[demo] watchdog fired at RSS {m.group(1)} GB",
                      file=sys.stderr)
            m = loss_re.search(line)
            if m:
                losses.append((int(m.group(1)), int(m.group(2)),
                               float(m.group(3))))
    rc = proc.wait()

    troughs = []
    for t_fire in reexec_times:
        after = [mb for (t, mb) in rss if t > t_fire + 5]
        if after:
            troughs.append(round(min(after[:60]), 1))
    result = {
        "metric": "rss_watchdog_demo",
        "value": float(len(reexec_times)),
        "unit": "re-execs (watchdog firings) during the run",
        "vs_baseline": None,
        "extra": {
            "rc": rc, "epochs": args.epochs, "steps": args.steps,
            "batch": args.batch, "vocab": args.vocab,
            "watchdog_gb": args.watchdog_gb,
            "rss_mb_at_fire": [round(x, 1) for x in reexec_rss],
            "rss_mb_post_restart_trough": troughs,
            "rss_mb_max": round(max((mb for _, mb in rss), default=0.0), 1),
            "loss_windows": len(losses),
            "epochs_seen": sorted({e for e, _, _ in losses}),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
