"""Aggregate a jax.profiler trace for TPU perf work.

Usage:
  python tools/trace_analyze.py /tmp/jaxtrace          # category/dtype table
  python tools/trace_analyze.py /tmp/jaxtrace --top 20 # biggest single ops

Reads the Chrome-trace JSON (vm.trace.json.gz) the profiler writes, keeps
the device 'XLA Ops' track, buckets leaf ops by (enclosing jit module,
hlo_category, output dtype), and prints a sorted table. This is how the
round-1 perf findings were made (f32 promotion, grouped-reshape layout
copies, attention block sizing) — see CLAUDE.md perf notes.
"""

import collections
import glob
import gzip
import json
import sys


def load(trace_dir: str):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)["traceEvents"]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top = 0
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    ev = load(trace_dir)
    # device pid: the process named like a device; ops track tid from
    # thread_name == 'XLA Ops'; module windows from 'XLA Modules'
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in pids.items() if "TPU" in n or "device" in n]
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ops_tracks = {k for k, n in tids.items()
                  if n == "XLA Ops" and k[0] in dev}
    mod_tracks = {k for k, n in tids.items()
                  if n == "XLA Modules" and k[0] in dev}

    wins = []
    for e in ev:
        if e.get("ph") == "X" and (e["pid"], e["tid"]) in mod_tracks:
            wins.append((e["name"].split("(")[0], e["ts"], e["ts"] + e["dur"]))

    def module_of(ts):
        for n, a, b in wins:
            if a <= ts <= b:
                return n
        return "?"

    agg = collections.Counter()
    singles = collections.Counter()
    names = {}
    for e in ev:
        if e.get("ph") != "X" or (e["pid"], e["tid"]) not in ops_tracks:
            continue
        a = e.get("args", {})
        hc = a.get("hlo_category", "?")
        if hc == "while":
            continue
        ln = a.get("long_name", "")
        dt = "f32" if "= f32[" in ln else ("bf16" if "= bf16[" in ln
                                           else "other")
        agg[(module_of(e["ts"]), hc, dt)] += e["dur"]
        singles[e["name"]] += e["dur"]
        names.setdefault(e["name"], ln)

    if top:
        for n, d in singles.most_common(top):
            print(f"{d/1e3:8.1f}ms  {names[n][:160]}")
        return
    for (m, hc, dt), d in agg.most_common(40):
        print(f"{d/1e6:8.3f}s  {m:28s} {hc:26s} {dt}")


if __name__ == "__main__":
    main()
