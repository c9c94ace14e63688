"""Parse a captured .xplane.pb and print the step budget (VERDICT r3 item 3).

Reads the device's serialized 'XLA Ops' timeline (the real per-op self
times — the 'Async XLA Ops' line holds overlapping DMA events and must NOT
be summed into the budget), groups ops by name, classifies every op into a
category by its HLO name + operand shapes, and prints:

  * the top-N ops with per-step self time,
  * a category rollup reconciled against the step wall-clock,

so "where do the non-matmul milliseconds live" has a measured answer.

Usage:  python scripts/analyze_trace.py <trace_dir_or_xplane.pb> --steps 10
"""

import argparse
import glob
import os
import re
from collections import defaultdict

CATEGORIES = [
    # (category, regex) — `head` is "%opname = result_shape" only (operand
    # text would misattribute: every op consuming a %copy would count as
    # copy), `result` is the result-shape part of the head.
    ("attention_kernel", r"^%(self_attn|cross_attn|attn|flash|fused_heads)"),
    ("copy", r"^%(copy|bitcast)"),
    ("vocab_ce", r"50272\b|32128\b"),
    ("ffn", r"\b(32,640,3072|640,3072|32,640,16384)\b"),
    ("layernorm", r"^%multiply_reduce_fusion"),
    ("dropout_rng", r"^%(convert_reduce_fusion|rng)|u32\["),
    ("vision_tower", r"\b(192,197|2304,197|197,197|192,3,224|197,768)\b"),
]


def head_of(name):
    return name.split(" fusion(")[0].split(" custom-call(")[0].split(
        " convolution(")[0]


def classify(name):
    head = head_of(name)
    for cat, rx in CATEGORIES:
        if re.search(rx, head):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--full", action="store_true",
                    help="print untruncated names for the top ops")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = args.path
    if os.path.isdir(path):
        planes = glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                           recursive=True)
        assert planes, f"no xplane under {path}"
        path = sorted(planes)[-1]

    space = xplane_pb2.XSpace.FromString(open(path, "rb").read())
    rows = defaultdict(lambda: [0, 0.0])
    step_ms = None
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name == "XLA Modules" and line.events:
                step_ms = (sum(e.duration_ps for e in line.events)
                           / len(line.events) / 1e9)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = (meta[ev.metadata_id].name
                        if ev.metadata_id in meta else "?")
                rows[name][0] += 1
                rows[name][1] += ev.duration_ps

    total_ms = sum(v[1] for v in rows.values()) / 1e9 / args.steps
    print(f"step wall-clock {step_ms:.2f} ms; XLA-Ops self-time "
          f"{total_ms:.2f} ms/step ({100*total_ms/step_ms:.1f}% busy)\n")

    width = 200 if args.full else 110
    print(f"{'ms/step':>8s} {'n':>5s}  {'cat':16s} op")
    cats = defaultdict(float)
    for name, (n, ps) in sorted(rows.items(), key=lambda kv: -kv[1][1]):
        cats[classify(name)] += ps / 1e9 / args.steps
    for i, (name, (n, ps)) in enumerate(
            sorted(rows.items(), key=lambda kv: -kv[1][1])):
        if i < args.top:
            print(f"{ps/1e9/args.steps:8.3f} {n:5d}  "
                  f"{classify(name):16s} {name[:width]}")

    print("\ncategory rollup (ms/step):")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:18s} {ms:8.2f}  ({100*ms/step_ms:.1f}%)")


if __name__ == "__main__":
    main()
