"""Host-side synthetic parameter trees: eval_shape + numpy fills.

For synthetic (random-weight) full-size runs, a real `module.init` is
the wrong tool: it compiles a multi-minute XLA program per model (on
the TPU it also blocks the tunnel), and it materializes f32 trees that
transiently double HBM next to their working copies — the 3.7B-param
BLIP-2 alone is ~15 GB f32.  `jax.eval_shape` traces the init without
compiling or materializing anything; each leaf is then filled host-side
with numpy at flax-like scales (lecun-uniform kernels, zero biases,
unit norm scales, 0.02-std embeddings) in the requested dtype and
device_put once.  Values only need plausible-scale randomness —
synthetic runs measure wiring/throughput, not numerics — and compiled
graphs key on shapes, not values.  bench.py and the CLI's
--synthetic full-size branches share this.
"""

from __future__ import annotations

import time

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def synth_params(init_fn: Callable, *args, dtype=jnp.bfloat16,
                 seed: int = 0, device=None,
                 note: Optional[Callable[[str], None]] = None):
    """Shape-trace `init_fn(*args)` and fill leaves host-side.

    dtype: target dtype for floating leaves (bf16 halves transfer and
    residency; weights upcast at use under f32 inputs). Non-floating
    leaves are zero-filled at their traced dtype.
    """
    import ml_dtypes
    import torch

    t0 = time.perf_counter()
    shapes = jax.eval_shape(init_fn, *args)
    t_trace = time.perf_counter() - t0
    rng = np.random.default_rng(seed)
    np_dtype = (ml_dtypes.bfloat16 if dtype == jnp.bfloat16
                else np.dtype(dtype))

    def to_dtype(arr):
        if np_dtype == np.float32:
            return arr
        # numpy's software bf16 cast is scalar-slow at 10^9 elements;
        # torch's is vectorized — round-trip through a uint16 view
        t = torch.from_numpy(arr).to(torch.bfloat16)
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)

    def fill(path, sd):
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return np.zeros(sd.shape, sd.dtype)
        if name == "bias" or sd.ndim <= 1 and name != "scale":
            return np.zeros(sd.shape, np_dtype)
        if name == "scale" or sd.ndim == 0:
            return np.ones(sd.shape, np_dtype)
        if name == "embedding":
            std = 0.02
        else:  # dense/conv kernels: lecun-normal-like scale
            std = 1.0 / np.sqrt(max(1, int(np.prod(sd.shape[:-1]))))
        # uniform at matched variance: ~2x faster to draw than normals
        # (f32 draws in place; rng.uniform would draw f64 then copy)
        a = np.float32(np.sqrt(3.0) * std)
        x = rng.random(sd.shape, dtype=np.float32)
        x *= 2 * a
        x -= a
        return to_dtype(x)

    tree = jax.tree_util.tree_map_with_path(fill, shapes)
    t_fill = time.perf_counter() - t0 - t_trace
    out = jax.device_put(tree, device or jax.devices()[0])
    if note is not None:
        note(f"  (trace {t_trace:.1f}s, fill {t_fill:.1f}s, "
             f"put {time.perf_counter() - t0 - t_trace - t_fill:.1f}s)")
    return out
