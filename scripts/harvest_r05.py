"""Assemble round-5 chip-queue results into BENCH_r05_aux.json.

Each chip job (scripts/chip_queue_r05_all.sh) logs to log/r05/<name>.log.
This harvester extracts the machine-readable tail of every completed job —
the one-JSON-line records from bench.py / soak.py / probe_67b.py, and the
EXACT/DIVERGES verdict lines from verify_replay.py — and appends them as
JSON-lines to BENCH_r05_aux.json (same format as BENCH_r04_aux.json),
de-duplicated by metric name so re-running after more jobs finish is safe.
Non-JSON jobs (ab_t5_attention, ab_ce, verify_bias, profile_t5) are
summarized into a {"metric": "<name>_log", "raw_tail": ...} record for
the PARITY write-up to quote.

Run:  python scripts/harvest_r05.py [--log-dir log/r05] [--out BENCH_r05_aux.json]
"""
import argparse
import json
import os
import re

JSON_JOBS = ("bench_headline", "soak_5k", "probe_67b", "bench_t5",
             "bench_chunked", "bench_pipeline", "bench_pipeline_uncached",
             "bench_eval", "bench_generate", "bench_data",
             # CPU-backend evidence captured while the tunnel was down
             # (clearly labeled: backend stamped below)
             "soak_cpu_tiny", "soak_cpu_tiny_short",
             # session close-out: quiet-host T5 re-measure, transfer-leak
             # probe, RSS-watchdog on-chip demo
             "bench_t5_quiet", "probe_rss_leak", "probe_watchdog")
TEXT_JOBS = ("verify_bias", "ab_t5", "ab_t5_drop", "ab_ce_chunked",
             "profile_t5")


def last_json_line(path):
    rec = None
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    rec = json.loads(line)
                except ValueError:
                    pass
    return rec


def replay_record(log_dir, suffix="", metric="replay_fidelity_on_chip"):
    """Fold verify_replay phase a+b logs into one structured record."""
    verdicts = {}
    for phase, name in (("a", f"verify_replay{suffix}_a"),
                        ("b", f"verify_replay{suffix}_b")):
        p = os.path.join(log_dir, f"{name}.log")
        if not os.path.exists(p):
            continue
        text = open(p, errors="replace").read()
        for m in re.finditer(r"\[(\d)\][^\n]*?->\s*(EXACT|DIVERGES)", text):
            verdicts[f"tier{m.group(1)}_phase_{phase}"] = m.group(2)
        m = re.search(r"\[1\] roundtrip bitwise: params ([^\n]*)", text)
        if m:
            verdicts[f"roundtrip_phase_{phase}"] = m.group(1).strip()
    if not verdicts:
        return None
    return {"metric": metric, "value":
            1.0 if all(v == "EXACT" for k, v in verdicts.items()
                       if v in ("EXACT", "DIVERGES")) else 0.0,
            "unit": "all-tiers-exact", "vs_baseline": None,
            "extra": verdicts}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default="log/r05")
    ap.add_argument("--out", default="BENCH_r05_aux.json")
    args = ap.parse_args()

    records = []
    for name in JSON_JOBS:
        p = os.path.join(args.log_dir, f"{name}.log")
        if os.path.exists(p):
            rec = last_json_line(p)
            if rec is not None:
                rec.setdefault("metric", name)
                rec["job"] = name
                if name.startswith("soak_cpu"):
                    rec["backend"] = "cpu"
                records.append(rec)
            else:
                print(f"[harvest] {name}: no JSON tail yet")
    rr = replay_record(args.log_dir)
    if rr:
        records.append(rr)
    rr_cpu = replay_record(args.log_dir, suffix="_cpu",
                           metric="replay_fidelity_cpu")
    if rr_cpu:
        rr_cpu["backend"] = "cpu"
        records.append(rr_cpu)
    for name in TEXT_JOBS:
        p = os.path.join(args.log_dir, f"{name}.log")
        if os.path.exists(p):
            tail = [ln.rstrip() for ln in
                    open(p, errors="replace").read().splitlines()
                    if ln.strip()][-12:]
            records.append({"metric": f"{name}_log", "value": None,
                            "unit": "raw", "vs_baseline": None,
                            "raw_tail": tail})

    # merge with whatever the artifact already holds, new records win
    merged = {}
    if os.path.exists(args.out):
        for line in open(args.out):
            line = line.strip()
            if line:
                try:
                    old = json.loads(line)
                    merged[old.get("job") or old["metric"]] = old
                except (ValueError, KeyError):
                    pass
    for rec in records:
        merged[rec.get("job") or rec["metric"]] = rec
    with open(args.out, "w") as f:
        for rec in merged.values():
            f.write(json.dumps(rec) + "\n")
    print(f"[harvest] wrote {len(merged)} records to {args.out}")


if __name__ == "__main__":
    main()
