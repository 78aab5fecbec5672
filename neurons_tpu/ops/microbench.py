"""Kernel micro-benchmarks: Pallas vs XLA on the UNet's hot shapes.

The TPU-native counterpart of the reference's attention micro-benchmark
(reference generative_models/scripts/tests/attention.py:10-319, which
compares torch SDPA backends). Run on a TPU:

    python -m neurons_tpu.ops.microbench

Shapes benchmarked are the actual stage-3/5 hot paths: unCLIP UNet
self/cross attention at 96x96-latent resolutions and the ResBlock
GroupNorm+SiLU sites.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters: int = 20) -> float:
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def bench_attention():
    from neurons_tpu.ops.attention import flash_attention, xla_attention

    print("== attention (bf16) ==")
    cases = [
        ("self 48x48 (ds2)", (2, 10, 2304, 64), 2304),
        ("self 24x24 (ds4)", (2, 20, 576, 64), 576),
        ("cross 48x48->256", (2, 10, 2304, 64), 256),
        ("cross 24x24->256", (2, 20, 576, 64), 256),
        ("prior 513 tokens", (2, 32, 513, 52), 513),
    ]
    for name, qshape, tk in cases:
        b, h, tq, d = qshape
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, tq, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, h, tk, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, h, tk, d), jnp.bfloat16)
        t_xla = _timeit(jax.jit(xla_attention), q, k, v)
        try:
            t_pallas = _timeit(jax.jit(flash_attention), q, k, v)
        except Exception as e:
            t_pallas = float("nan")
            print(f"  {name}: pallas FAILED: {type(e).__name__}: {e}")
        flops = 4 * b * h * tq * tk * d
        print(f"  {name}: xla {t_xla:.3f} ms | pallas {t_pallas:.3f} ms "
              f"| {flops / max(t_pallas, 1e-9) / 1e9:.1f} GFLOP/ms pallas")


def bench_groupnorm():
    from neurons_tpu.ops.fused_norm import (group_norm_silu,
                                            group_norm_silu_reference)

    print("== groupnorm+silu (bf16, via dispatching API) ==")
    cases = [
        ("unet 96x96x320", (2, 96, 96, 320)),
        ("unet 48x48x640", (2, 48, 48, 640)),
        ("unet 24x24x1280", (2, 24, 24, 1280)),
        ("unet 12x12x1280", (2, 12, 12, 1280)),
    ]
    for name, shape in cases:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        scale = jnp.ones((shape[-1],))
        bias = jnp.zeros((shape[-1],))
        ref = functools.partial(group_norm_silu_reference, groups=32)
        t_xla = _timeit(jax.jit(ref), x, scale, bias)
        try:
            fused = functools.partial(group_norm_silu, groups=32)
            t_pallas = _timeit(jax.jit(fused), x, scale, bias)
            # correctness spot check
            a = np.asarray(jax.jit(ref)(x, scale, bias), np.float32)
            b = np.asarray(jax.jit(fused)(x, scale, bias), np.float32)
            err = np.abs(a - b).max()
        except Exception as e:
            t_pallas, err = float("nan"), float("nan")
            print(f"  {name}: pallas FAILED: {type(e).__name__}: {e}")
        gb = np.prod(shape) * 2 * 2 / 1e9
        print(f"  {name}: xla {t_xla:.3f} ms | pallas {t_pallas:.3f} ms | "
              f"maxerr {err:.4f} | {gb / max(t_pallas * 1e-3, 1e-9):.0f} GB/s pallas")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.getcwd())
    # the fused GN+SiLU dispatch is opt-in; the microbench exists to
    # compare it, so force it on for this process
    os.environ["NEURONS_TPU_FUSED_NORM"] = "1"
    from neurons_tpu.utils import compile_cache
    compile_cache.setup("tpu")
    print("device:", jax.devices()[0])
    bench_attention()
    bench_groupnorm()
