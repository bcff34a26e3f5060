#!/usr/bin/env python
"""Summarize a jax profiler trace: per-op SELF time on the TPU.

Usage:
    python tools/summarize_profile.py <trace_dir_or_trace.json.gz> \
        [top_n] [n_steps]

``n_steps`` is the number of train steps you traced (the device 'Steps'
lane does not map 1:1 to optimizer steps); totals divide by it.

Parses the ``*.trace.json.gz`` written by ``jax.profiler.start_trace``
(plugins/profile/<ts>/*.trace.json.gz), takes the device 'XLA Ops' lanes,
subtracts child durations by time containment (named computations like
``checkpoint``/``closed_call`` otherwise absorb their Pallas custom-call
children), and prints the top ops with their source locations.

The trainer writes traces when ``tpu.profile_dir`` is set (only through
``Trainer.train``); for bare ``train_step`` loops wrap the calls in
``jax.profiler.start_trace``/``stop_trace`` yourself.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path: str) -> str:
    if path.endswith(".json.gz"):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def summarize(trace_path: str, top_n: int = 30,
              n_steps: int | None = None):
    with gzip.open(trace_path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

    lanes = collections.defaultdict(list)
    meta = {}
    for e in events:
        lane = tids.get((e.get("pid"), e.get("tid")))
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if lane == "XLA Ops":
            lanes[(e["pid"], e["tid"])].append(e)
            if e["name"] not in meta and e.get("args"):
                meta[e["name"]] = e["args"]

    self_dur = collections.Counter()
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        for e in evs:
            ts, dur = e["ts"], e["dur"]
            while stack and ts >= stack[-1][0] + stack[-1][1] - 1e-6:
                stack.pop()
            if stack:
                self_dur[stack[-1][2]] -= dur
            self_dur[e["name"]] += dur
            stack.append((ts, dur, e["name"]))

    denom = max(n_steps or 1, 1)
    total = sum(self_dur.values())
    print(f"trace: {trace_path}")
    print(f"divided by {denom} step(s); total device self-time: "
          f"{total / denom / 1e3:.1f} ms/step")
    for name, d in self_dur.most_common(top_n):
        a = meta.get(name, {})
        src = a.get("source", "")
        long_name = str(a.get("long_name", ""))[:60]
        print(f"{d / denom / 1e3:9.2f} ms/step  {name[:40]:40s} "
              f"{src}  {long_name}")


if __name__ == "__main__":
    summarize(find_trace(sys.argv[1]),
              int(sys.argv[2]) if len(sys.argv) > 2 else 30,
              int(sys.argv[3]) if len(sys.argv) > 3 else None)
