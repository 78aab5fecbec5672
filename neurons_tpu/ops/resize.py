"""Torch/torchvision-exact bilinear resize for the saved-artifact dialect.

The reference saves its stage-3 recons through
``transforms.Resize((256,256))`` on a TENSOR under torchvision 0.16.0
(reference recon_keyframe_neurons.py:443-444, README.md:52 pins
torchvision==0.16.0). In that version the transform's ``antialias``
default is the "warn" sentinel, which for tensor inputs behaves as
``antialias=False`` — i.e. plain ``F.interpolate(mode='bilinear',
align_corners=False)`` two-tap sampling (the default flipped to True
only in torchvision 0.17). SSIM/PSNR of the saved artifacts are
computed AFTER this resize (reference run_metrics.py:99-110), so the
repo's resize must match it tap-for-tap: the 1%-parity budget
(BASELINE.md) is easily eaten by a filter mismatch at a 3x
downsampling.

Both semantics are implemented exactly, as dense separable weight
matrices applied with two matmuls (MXU-friendly; a [256,768] operand is
trivially small, and XLA fuses the pair):

  resize_reference(x, (h, w))                 -> torchvision-0.16 tensor
                                                 dialect (antialias=False)
  resize_reference(x, (h, w), antialias=True) -> torch
                                                 F.interpolate(...,
                                                 antialias=True) / PIL
                                                 triangle filter

Golden parity vs the installed torch: tests/test_resize.py.
"""

from __future__ import annotations

import functools

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _weights_noaa(in_size: int, out_size: int) -> np.ndarray:
    """Plain bilinear (align_corners=False, half-pixel centers), the
    torch `upsample_bilinear2d` CPU kernel's sampling: two taps at
    floor/ceil of src = (i + 0.5) * scale - 0.5, src clamped at 0."""
    w = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        w[i, i0] += 1.0 - frac
        w[i, i1] += frac
    return w


def _weights_aa(in_size: int, out_size: int) -> np.ndarray:
    """Antialiased bilinear — the PIL-style triangle filter torch's
    `_upsample_bilinear2d_aa` implements: support scales with the
    downsampling factor, weights normalized per output pixel."""
    w = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    support = max(scale, 1.0)  # filter support 1.0, stretched by scale
    invscale = 1.0 / max(scale, 1.0)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        t = (np.arange(lo, hi) - center + 0.5) * invscale
        taps = np.maximum(0.0, 1.0 - np.abs(t))
        s = taps.sum()
        if s > 0:
            w[i, lo:hi] = taps / s
    return w


@functools.lru_cache(maxsize=64)
def _weight_pair(in_h: int, in_w: int, out_h: int, out_w: int,
                 antialias: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fn = _weights_aa if antialias else _weights_noaa
    return (jnp.asarray(fn(in_h, out_h), jnp.float32),
            jnp.asarray(fn(in_w, out_w), jnp.float32))


def resize_np(x: np.ndarray, out_hw: Tuple[int, int],
              antialias: bool = False) -> np.ndarray:
    """Host-numpy twin of `resize_reference` — identical taps (shared
    weight builders), applied with np.einsum instead of a device call.
    For host-side artifact composition (e.g. the stage-5 GT panel,
    resized once per clip on the CLI path) where shipping 8 MB through
    the device tunnel per clip costs more than the resize itself."""
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    fn = _weights_aa if antialias else _weights_noaa
    wh, ww = fn(in_h, out_h), fn(in_w, out_w)
    # two BLAS GEMMs, NOT one 3-operand einsum: np.einsum without
    # `optimize` evaluates "oh,...hw,pw->...op" as an O(o*h*w*p) nested
    # loop — measured 94 s for one [6,3,224,224]->256 clip on the
    # 1-core host, which silently turned the stage-5 compose phase into
    # 95 s/clip the first time a drive fed 224-px GTs through it (the
    # r4 full split had 256-px GTs, so the no-op early-return hid it).
    # Pairwise it is two ~0.5 GFLOP matmuls (~0.1 s).
    y = (wh @ x.astype(np.float32)) @ ww.T
    return y.astype(x.dtype)


def resize_reference(x: jnp.ndarray, out_hw: Tuple[int, int],
                     antialias: bool = False) -> jnp.ndarray:
    """Resize the trailing two (H, W) axes of `x` with the reference's
    exact torch semantics (see module docstring). Any leading batch/
    channel axes; float dtypes computed in f32 like torch's CPU kernel,
    returned in the input dtype."""
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    wh, ww = _weight_pair(in_h, in_w, out_h, out_w, bool(antialias))
    dtype = x.dtype
    y = jnp.einsum("oh,...hw,pw->...op", wh, x.astype(jnp.float32), ww,
                   precision="highest")
    return y.astype(dtype)
