"""Aggregate a jax.profiler trace for TPU perf work.

Usage:
  python tools/trace_analyze.py /tmp/jaxtrace          # category/dtype table
  python tools/trace_analyze.py /tmp/jaxtrace --top 20 # biggest single ops
  python tools/trace_analyze.py /tmp/jaxtrace --by scope   # tf_op path
  python tools/trace_analyze.py /tmp/jaxtrace --by source  # file:line
  python tools/trace_analyze.py /tmp/jaxtrace --by shape   # out shape+layout

Reads the Chrome-trace JSON (vm.trace.json.gz) the profiler writes, keeps
the device 'XLA Ops' track, buckets leaf ops by (enclosing jit module,
hlo_category, output dtype), and prints a sorted table. This is how the
round-1 perf findings were made (f32 promotion, grouped-reshape layout
copies, attention block sizing) — see CLAUDE.md perf notes.

The --by modes carry achieved TF/s (model_flops / device time) so
sub-roofline regions stand out; `--by source` attributes whole scan
loops to their call line (the while op is excluded from every other
grouping to avoid double counting). The round-2 attribution of the
5.75 s/clip bench (CLAUDE.md) came from these tables.
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


def _by_table(ev, ops_tracks, mode):
    """Group device time by tf_op scope / source line / output
    shape+layout, with achieved TF/s."""
    import re
    agg = collections.defaultdict(lambda: [0.0, 0.0])
    for e in ev:
        if e.get("ph") != "X" or (e["pid"], e["tid"]) not in ops_tracks:
            continue
        a = e.get("args", {})
        if a.get("hlo_category") == "while" and mode != "source":
            continue
        if mode == "scope":
            key = re.sub(r"_\d+", "_N",
                         "/".join(a.get("tf_op", "?").split("/")[:6]))
        elif mode == "source":
            key = a.get("source", "?")
        else:  # shape
            ln = a.get("long_name", "")
            m = re.match(r"%\S+ = \(?(\w+\[[\d,]*\]\{[\d,]*)", ln)
            key = m.group(1) if m else "?"
        agg[key][0] += e["dur"] / 1e6
        agg[key][1] += float(a.get("model_flops", 0) or 0)
    for k, (d, f) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        tfs = f / d / 1e12 if d else 0.0
        print(f"{d:8.3f}s {tfs:6.1f}TF/s  {k}")


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top = 0
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    by = sys.argv[sys.argv.index("--by") + 1] if "--by" in sys.argv else None
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

    if by:
        _by_table(ev, ops_tracks, by)
        return

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
