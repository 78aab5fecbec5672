"""Probe whether XLA:TPU reaches the int8 MXU rate (2x bf16 peak on v5e).

Times s8 x s8 -> s32 dot_general against bf16 x bf16 -> f32 at the
bench's hot matmul shapes. The tunnel makes per-call wall times dispatch
-bound, so each measurement runs REPS matmuls inside ONE jitted
fori_loop (data-dependent chaining defeats CSE) and syncs on a scalar.

Run on the TPU from /root/repo WITHOUT PYTHONPATH:  python tools/int8_probe.py

MEASURED VERDICT (v5e, 2026-08-18, chained 4096^3 wall clock in one jit):
bf16 108-120 TF/s vs s8 164-173 TOP/s — XLA's s8 dot reaches only ~1.45x
bf16 in practice (49% of the 394 TOP/s paper rate vs 61-66% of bf16
peak), and the s32->f32 dequant epilogue costs a full extra HBM pass
unless fused. With matmuls ~60% of bench device time that bounds a w8a8
path at ~1.2x e2e BEFORE quality loss — not worth an opt-in quantized
path here; revisit only if XLA's int8 lowering improves.

Caveat on the in-loop fori probe below: XLA hoists loop-invariant
matmuls unless the carry chain is unfoldable, and trace device-time for
while-body ops is not per-iteration — trust only the chained-square
wall numbers above (REPS matmuls inside ONE jit, scalar-materialized).
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurons_tpu.utils import compile_cache  # noqa: E402
compile_cache.setup("tpu")

SHAPES = [
    (1152, 1280, 5120),
    (4608, 640, 2560),
    (32768, 320, 1280),
    (4096, 4096, 4096),
]
REPS = 32


@partial(jax.jit, static_argnames=("mode",))
def loop(a, b, mode):
    def mm(x):
        if mode == "bf16":
            out = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return out
        acc = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        if mode == "s8":
            return acc
        # realistic w8a8 epilogue: per-row act scale * per-col weight scale
        sa = jnp.full((x.shape[0], 1), 0.01, jnp.float32)
        sb = jnp.full((1, b.shape[1]), 0.02, jnp.float32)
        return acc.astype(jnp.float32) * sa * sb

    def body(i, carry):
        x, s = carry
        out = mm(x)
        s = s + out[0, 0].astype(jnp.float32)
        # chain dependency the compiler cannot fold away (s*0 folds and
        # the matmul gets hoisted): numerically-zero but unprovable terms
        if mode == "bf16":
            x = x + (s * jnp.float32(1e-42)).astype(x.dtype)
        else:
            x = x ^ jnp.isnan(s).astype(x.dtype)
        return x, s

    _, s = jax.lax.fori_loop(0, REPS, body, (a, jnp.float32(0)))
    return s


def timed(a, b, mode):
    """Device time per matmul via a profiler trace (tunnel wall times are
    dispatch noise — CLAUDE.md perf notes)."""
    import os
    import shutil
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools import trace_analyze
    _ = float(loop(a, b, mode))  # warm
    tdir = "/tmp/int8_probe_trace"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        s = float(loop(a, b, mode))
    assert np.isfinite(s)
    ev = trace_analyze.load(tdir)
    tracks = {(e["pid"], e["tid"]) for e in ev
              if e.get("ph") == "M" and e.get("name") == "thread_name"
              and "XLA Ops" in e["args"].get("name", "")}
    dev_us = sum(e["dur"] for e in ev if e.get("ph") == "X"
                 and (e["pid"], e["tid"]) in tracks
                 and e.get("args", {}).get("hlo_category") != "while")
    return dev_us / 1e6 / REPS


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    for (m, k, n) in SHAPES:
        ka, kb = jax.random.split(key)
        a16 = jax.random.normal(ka, (m, k), jnp.bfloat16)
        b16 = jax.random.normal(kb, (k, n), jnp.bfloat16)
        a8 = jnp.asarray(np.random.randint(-127, 127, (m, k), np.int8))
        b8 = jnp.asarray(np.random.randint(-127, 127, (k, n), np.int8))

        t16 = timed(a16, b16, "bf16")
        t8 = timed(a8, b8, "s8")
        t8s = timed(a8, b8, "s8_scaled")
        fl = 2 * m * k * n
        print(f"[{m:6d},{k:5d},{n:5d}] bf16 {t16*1e6:8.1f} us ({fl/t16/1e12:6.1f} TF/s)"
              f" | s8 {t8*1e6:8.1f} us ({fl/t8/1e12:6.1f} TOP/s)"
              f" | s8+scale {t8s*1e6:8.1f} us ({fl/t8s/1e12:6.1f} TOP/s)"
              f" | speedup {t16/t8s:4.2f}x")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
