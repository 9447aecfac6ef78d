#!/usr/bin/env python
"""Aggregate a jax perfetto trace into a per-op-category device-time
table (the per-op timeline PERF.md item 7 asked for).

Usage: python scripts/trace_report.py /tmp/jax_trace_r4
Finds the newest perfetto_trace.json.gz under the dir.
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def load(trace_dir):
    pjs = sorted(glob.glob(trace_dir + "/**/perfetto_trace.json.gz",
                           recursive=True))
    if not pjs:
        raise SystemExit("no perfetto trace under " + trace_dir)
    with gzip.open(pjs[-1], "rt") as fh:
        return json.load(fh), pjs[-1]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_r4"
    data, path = load(trace_dir)
    events = data.get("traceEvents", [])
    # map (pid,tid) -> track name from metadata
    tracks = {}
    pids = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "thread_name":
                tracks[(ev["pid"], ev["tid"])] = ev["args"]["name"]
            if ev.get("name") == "process_name":
                pids[ev["pid"]] = ev["args"]["name"]

    # collect X events per track
    per_track = defaultdict(list)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        key = (ev["pid"], ev["tid"])
        tname = tracks.get(key, str(key))
        pname = pids.get(ev["pid"], "")
        label = f"{pname}/{tname}"
        per_track[label].append(ev)

    if len(sys.argv) > 2 and sys.argv[2] == "--raw":
        # top individual events (unstripped names) on the XLA Ops track
        tot = {}
        for label, evs in per_track.items():
            if "XLA Ops" not in label:
                continue
            for e in evs:
                n = e.get("name", "?")
                tot[n] = tot.get(n, 0.0) + e.get("dur", 0)
        for n, us in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {us/1000:9.2f} ms  {n[:110]}")
        return

    for label, evs in sorted(per_track.items()):
        total_span = sum(e.get("dur", 0) for e in evs)
        if total_span < 1000 or "python" in label:
            continue
        # self-time via stack sweep: sort by (ts, -dur); nested events
        # subtract from the enclosing event's self time
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        selft = defaultdict(float)
        counts = defaultdict(int)
        stack = []  # (end_ts, name)
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            name = re.sub(r"\.\d+$", "", e.get("name", "?"))
            name = re.sub(r"\(\d+\)", "", name)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                selft[stack[-1][1]] -= dur
            selft[name] += dur
            counts[name] += 1
            stack.append((ts + dur, name))
        print(f"\n== track {label}  (self-time; sum "
              f"{sum(selft.values())/1000:.2f} ms) ==")
        for name, us in sorted(selft.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {us/1000:9.2f} ms  x{counts[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
