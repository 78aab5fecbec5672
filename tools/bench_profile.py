"""Profile the honest e2e bench on the real chip.

Runs bench.build(), warms up (compile), then captures one traced
run_once under jax.profiler and prints the top device ops via
tools/trace_analyze.py. Device-time aggregates are tunnel-noise-free
(unlike host wall readings — CLAUDE.md perf notes).

Usage (from /root/repo, NO PYTHONPATH on TPU):
    python tools/bench_profile.py [trace_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace"
    stage3, stage5, params, n_vox = bench.build()
    key = jax.random.PRNGKey(0)
    print("warmup (compile) ...", flush=True)
    bench.run_once(stage3, stage5, params, key, 1, n_vox)
    print("tracing ...", flush=True)
    with jax.profiler.trace(trace_dir):
        bench.run_once(stage3, stage5, params, jax.random.PRNGKey(1), 1,
                       n_vox)
    print(f"trace -> {trace_dir}", flush=True)
    from tools import trace_analyze
    sys.argv = ["trace_analyze", trace_dir]
    trace_analyze.main()


if __name__ == "__main__":
    main()
