"""Suite runner: full pytest with file-level parallelism when cores allow.

`python -m pytest tests/ -x -q` stays the canonical single-process run.
This wrapper cuts wall time on multi-core hosts by sharding test FILES
across pytest-xdist workers (`--dist loadfile` keeps each file's
fixtures, tiny-model caches, and subprocess e2e chains inside one
worker — several test modules build module-scoped params). On the
1-core builder host it degrades to the plain run; either way the
persistent compile cache (neurons_tpu/utils/compile_cache.py) is the
bigger lever — a cold suite is dominated by XLA:CPU compiles.

Run: python tools/run_suite.py [extra pytest args]
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ncpu = os.cpu_count() or 1
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           "--durations=15"]
    if ncpu > 1:
        try:
            import xdist  # noqa: F401
            workers = min(ncpu, 4)  # tiny models; RAM bounds past 4
            cmd += ["-n", str(workers), "--dist", "loadfile"]
            print(f"[run_suite] {ncpu} cores -> {workers} xdist workers "
                  "(loadfile)", flush=True)
        except ImportError:
            cmd += ["-x"]
    else:
        cmd += ["-x"]
        print("[run_suite] single core -> plain pytest -x", flush=True)
    cmd += sys.argv[1:]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    raise SystemExit(subprocess.call(cmd, cwd=_REPO, env=env))


if __name__ == "__main__":
    main()
