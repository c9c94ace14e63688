"""Localize the on-chip soak's host-RSS growth (PARITY round-5 open item).

The 5K-step production-vocab soak grew host RSS 2.5 -> 10.3 GB while the
30K-step CPU-backend soak stayed flat (+140 MB), so the growth is specific
to the on-chip (axon tunnel) path, not the training code. This probe
isolates the three per-step host-side mechanisms and measures RSS after
each in a single process:

  phase transfer : N x device_put(host batch) + delete   (tunnel client)
  phase donate   : N x donated jit step on device-resident state
  phase fetch    : N x device->host readback (loss scalar + a small array)
  phase steplike : N x (transfer batch -> donated step -> fetch loss),
                   the soak's actual per-step shape

Run:  python scripts/probe_rss_leak.py [--iters 300] [--mb 2]
Output: one JSON line {"metric": "rss_leak_probe", ...} with per-phase
RSS deltas and KB/iter slopes (slope = last-half RSS delta / iters, so
warmup allocations don't count).
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def run_phase(name, fn, iters):
    import gc
    # warmup + settle
    for _ in range(5):
        fn()
    gc.collect()
    r0 = rss_mb()
    half = iters // 2
    rhalf = r0
    for i in range(iters):
        fn()
        if i == half:
            gc.collect()
            rhalf = rss_mb()
    gc.collect()
    r1 = rss_mb()
    slope_kb = (r1 - rhalf) * 1024.0 / max(1, iters - half)
    print(f"[{name}] rss {r0:.1f} -> {r1:.1f} MB "
          f"(steady slope {slope_kb:.1f} KB/iter)", file=sys.stderr)
    return {"rss_start_mb": round(r0, 1), "rss_end_mb": round(r1, 1),
            "steady_slope_kb_per_iter": round(slope_kb, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--mb", type=float, default=2.0,
                    help="host batch size in MB (soak transfers ~1.6 MB/step)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n = int(args.mb * 1024 * 1024 / 4)
    host = np.zeros((n,), np.float32)
    results = {"backend": jax.default_backend(),
               "iters": args.iters, "mb_per_transfer": args.mb}

    # phase: raw host->device transfer, buffer dropped immediately
    def xfer():
        a = jax.device_put(host)
        a.block_until_ready()
        del a
    results["transfer"] = run_phase("transfer", xfer, args.iters)

    # phase: donated jit on device-resident state (no host traffic)
    state = jax.device_put(np.ones((1024, 1024), np.float32))

    @jax.jit
    def bump(s):
        return s * 1.000001
    bump = jax.jit(lambda s: s * 1.000001, donate_argnums=0)
    state = bump(state)  # compile

    def donate():
        nonlocal state
        state = bump(state)
        state.block_until_ready()
    results["donate"] = run_phase("donate", donate, args.iters)

    # phase: device->host readback
    dev = jax.device_put(np.zeros((n,), np.float32))

    def fetch():
        _ = np.asarray(dev[:8])
        _ = float(dev[0])
    results["fetch"] = run_phase("fetch", fetch, args.iters)

    # phase: the soak's per-step shape (transfer + donated step + fetch)
    @jax.jit
    def steplike_fn(s, b):
        return s * 0.999999 + jnp.sum(b) * 1e-12, jnp.sum(b)
    steplike_fn = jax.jit(
        lambda s, b: (s * 0.999999 + jnp.sum(b) * 1e-12, jnp.sum(b)),
        donate_argnums=0)
    state2 = jax.device_put(np.ones((1024, 1024), np.float32))
    state2, _ = steplike_fn(state2, jax.device_put(host))  # compile

    def steplike():
        nonlocal state2
        b = jax.device_put(host)
        state2, loss = steplike_fn(state2, b)
        _ = float(loss)
    results["steplike"] = run_phase("steplike", steplike, args.iters)

    print(json.dumps({"metric": "rss_leak_probe", "value":
                      results["steplike"]["steady_slope_kb_per_iter"],
                      "unit": "KB/iter (steplike steady slope)",
                      "vs_baseline": None, "extra": results}))


if __name__ == "__main__":
    main()
