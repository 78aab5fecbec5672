"""Fused GroupNorm + SiLU + 3x3 conv — the ResBlock hot path.

The BASELINE north-star kernel (SURVEY.md section 2f: the reference's
cuDNN GroupNorm+SiLU+conv sequences, reference openaimodel.py:210-356):
on TPU, XLA cannot fuse elementwise producers INTO a convolution, so the
composite materializes the normalized/activated tensor in HBM between
the GN apply and the conv read. This kernel removes that round trip:

  stats      per-(sample, group) mean/rstd — one XLA reduction pass,
             folded into per-channel gamma_hat/beta_hat
  kernel     per (sample, row-tile[, cout-tile]) program:
               - 3 manual DMAs bring the row window + 1-row halo from
                 HBM into VMEM (x never materializes a normalized copy)
               - normalize + SiLU the window in VMEM
               - conv3x3 as 9 shifted [rows*W, C] x [C, Cout] MXU
                 matmuls with f32 accumulation (halo rows / edge columns
                 zeroed to reproduce the conv's zero padding)

HBM traffic: read x twice (stats + kernel) + write y, vs the XLA
composite's read x twice + write xnorm + read xnorm + write y — saves a
full activation-tensor round trip per ResBlock norm/conv pair.

Opt-in via NEURONS_TPU_FUSED_GNCONV=1 until the e2e bench validates it
(the standalone GN+SiLU kernel measured neutral-to-negative because it
acted as a fusion barrier; fusing INTO the conv is the other half).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import flax.linen as flax_nn
import jax
import jax.numpy as jnp

from neurons_tpu.ops.fused_norm import _HAS_PALLAS, _on_tpu

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def gn_silu_conv_reference(x, gn_scale, gn_bias, kernel, conv_bias,
                           groups: int, eps: float = 1e-5):
    """XLA composite: GroupNorm -> SiLU -> 3x3 same-pad conv (NHWC).
    kernel [3, 3, Cin, Cout] (flax nn.Conv layout)."""
    from neurons_tpu.ops.fused_norm import group_norm_silu_reference

    h = group_norm_silu_reference(x, gn_scale, gn_bias, groups, eps)
    y = jax.lax.conv_general_dilated(
        h, kernel.astype(h.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + conv_bias.astype(y.dtype)


def _gn_hat(x, gn_scale, gn_bias, groups: int, eps: float):
    """Fold per-(n, group) stats into per-(n, channel) affine terms:
    y = x * gamma_hat + beta_hat. f32 stats (bf16-accumulated GN stats
    drift at 96x96 spatial sums)."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, c)
    s1 = xf.sum(axis=1)                    # [N, C]
    s2 = (xf * xf).sum(axis=1)
    cg = c // groups
    g1 = s1.reshape(n, groups, cg).sum(-1, keepdims=True)   # [N, G, 1]
    g2 = s2.reshape(n, groups, cg).sum(-1, keepdims=True)
    cnt = h * w * cg
    mean = g1 / cnt
    var = g2 / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean = jnp.broadcast_to(mean, (n, groups, cg)).reshape(n, c)
    rstd = jnp.broadcast_to(rstd, (n, groups, cg)).reshape(n, c)
    gamma_hat = gn_scale[None] * rstd
    beta_hat = gn_bias[None] - mean * gamma_hat
    return gamma_hat, beta_hat


_W_BUDGET = 4 * 1024 * 1024  # VMEM cap for the resident weights tile


def _pick_rows(hh: int) -> int:
    for bh in (8, 6, 4, 3, 2, 1):
        if hh % bh == 0:
            return bh
    return 1


def _kernel(x_hbm, gh_ref, bh_ref, w_ref, cb_ref, o_ref, xt_ref,
            acc_ref, sem, *, bh: int, hh: int, ww: int, cin: int,
            n_ht: int, n_cot: int):
    """Whole-sample variant: one DMA brings x[n] (slicing only the batch
    dim — partial-tile channel counts like 320 forbid row-sliced DMAs)
    into a scratch with one zero row of padding top and bottom; the
    sample is normalized+SiLU'd IN PLACE in row chunks, then each
    (row-tile, cout-tile) program runs the 9 shifted matmuls against
    dynamic row windows of the resident activated sample."""
    n = pl.program_id(0)
    ti = pl.program_id(1)
    cot = pl.program_id(2)

    @pl.when(jnp.logical_and(ti == 0, cot == 0))
    def _load_and_activate():
        cp = pltpu.make_async_copy(x_hbm.at[n], xt_ref.at[pl.ds(1, hh)],
                                   sem)
        cp.start()
        cp.wait()
        # conv zero padding applies to the ACTIVATED tensor; the pad
        # rows stay zero because activation below touches rows 1..hh
        xt_ref[pl.ds(0, 1), :, :] = jnp.zeros((1, ww, cin), xt_ref.dtype)
        xt_ref[pl.ds(hh + 1, 1), :, :] = jnp.zeros((1, ww, cin),
                                                   xt_ref.dtype)
        # per-sample affine row from the full [N, C] f32 block (dynamic
        # dim-0 slices on bf16 would need 2-row sublane alignment)
        g = gh_ref[pl.ds(n, 1), :]                 # [1, C] f32
        b = bh_ref[pl.ds(n, 1), :]

        def act(i, _):
            rows = xt_ref[pl.ds(1 + i * bh, bh)].astype(jnp.float32)
            hrow = rows * g[:, None, :] + b[:, None, :]
            xt_ref[pl.ds(1 + i * bh, bh)] = (
                hrow * jax.nn.sigmoid(hrow)).astype(xt_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_ht, act, 0)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    zcol = jnp.zeros((bh, 1, cin), xt_ref.dtype)
    for dy in (-1, 0, 1):
        # output rows [ti*bh, ti*bh+bh) read activated rows shifted by
        # dy; scratch row s holds image row s-1
        xs = xt_ref[pl.ds(ti * bh + dy + 1, bh), :, :]   # [bh, W, C]
        for dx in (-1, 0, 1):
            # y[c] sums x[c + dx] * K[dx + 1]: dx=-1 shifts right
            # (zero col enters on the left), dx=+1 shifts left
            if dx == -1:
                xsh = jnp.concatenate([zcol, xs[:, :-1, :]], axis=1)
            elif dx == 1:
                xsh = jnp.concatenate([xs[:, 1:, :], zcol], axis=1)
            else:
                xsh = xs
            wk = w_ref[(dy + 1) * 3 + (dx + 1)]    # [C, bco]
            acc_ref[...] += jax.lax.dot_general(
                xsh.reshape(bh * ww, cin), wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out = acc_ref[...] + cb_ref[...].astype(jnp.float32)
    o_ref[...] = out.reshape(bh, ww, -1).astype(o_ref.dtype)


def _pallas_gn_silu_conv(x, gn_scale, gn_bias, kernel, conv_bias, groups,
                         eps, interpret: bool = False):
    n, hh, ww, cin = x.shape
    cout = kernel.shape[-1]
    # gamma/beta stay f32: Mosaic's dynamic row slice (per-sample affine
    # lookup in-kernel) requires sublane-aligned indices, and bf16 packs
    # 2 rows per sublane ("index ... multiple of 2" compile error)
    gamma_hat, beta_hat = _gn_hat(x, gn_scale, gn_bias, groups, eps)
    wflat = kernel.reshape(9, cin, cout).astype(x.dtype)

    bh = _pick_rows(hh)
    esize = jnp.dtype(x.dtype).itemsize
    # cout tile: either the whole cout (block == array dim) or a
    # 128-multiple divisor (Mosaic requires last block dims divisible by
    # 128 or full); fall back to full cout when no such divisor exists
    bco = cout
    if 9 * cin * bco * esize > _W_BUDGET:
        for cand in range(cout - cout % 128, 127, -128):
            if cout % cand == 0 and 9 * cin * cand * esize <= _W_BUDGET:
                bco = cand
                break
    n_ht, n_cot = hh // bh, cout // bco

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, hh=hh, ww=ww, cin=cin,
                          n_ht=n_ht, n_cot=n_cot),
        grid=(n, n_ht, n_cot),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x in HBM
            # gamma/beta ride along whole ([N, C] is tiny); the kernel
            # slices the program's sample row (Mosaic wants full or
            # (8, 128)-divisible block dims)
            pl.BlockSpec((n, cin), lambda n_, ti, cot: (0, 0)),
            pl.BlockSpec((n, cin), lambda n_, ti, cot: (0, 0)),
            pl.BlockSpec((9, cin, bco), lambda n_, ti, cot: (0, 0, cot)),
            pl.BlockSpec((1, bco), lambda n_, ti, cot: (0, cot)),
        ],
        out_specs=pl.BlockSpec((None, bh, ww, bco),
                               lambda n, ti, cot: (n, ti, 0, cot)),
        out_shape=jax.ShapeDtypeStruct((n, hh, ww, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hh + 2, ww, cin), x.dtype),        # whole sample
            pltpu.VMEM((bh * ww, bco), jnp.float32),       # accumulator
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, gamma_hat, beta_hat, wflat,
      conv_bias.reshape(1, cout).astype(x.dtype))
    return out


def _enabled() -> bool:
    return os.environ.get("NEURONS_TPU_FUSED_GNCONV", "0") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gn_silu_conv(x, gn_scale, gn_bias, kernel, conv_bias, groups: int,
                 eps: float = 1e-5):
    """GroupNorm -> SiLU -> 3x3 same-pad conv, fused on TPU (opt-in via
    NEURONS_TPU_FUSED_GNCONV=1). x [N, H, W, C] NHWC, kernel
    [3, 3, Cin, Cout]. Falls back to the XLA composite off-TPU, for
    non-divisible channel groups, or when the row window would not fit
    VMEM."""
    usable = (
        _HAS_PALLAS and _on_tpu() and _enabled()
        and x.shape[-1] % groups == 0
        # Mosaic DMA requires lane-aligned channel counts (320 is 2.5
        # tiles -> "slice must be aligned to tiling (128)"); the 640 and
        # 1280 UNet levels qualify, the level-0 320/960 blocks take XLA
        and x.shape[-1] % 128 == 0
        and kernel.shape[0] == kernel.shape[1] == 3
        # measured on v5e (bf16): wins ~6% at 48x48 c640 (763 vs 816 us)
        # but LOSES 1.9x at 24x24 c1280 (2762 vs 1486 us — skinny
        # [192, C]x[C, 128] matmuls underfill the MXU), so small-spatial
        # deep levels stay on XLA
        and x.shape[1] * x.shape[2] >= 1024
        # the whole activated sample stays VMEM-resident (+2 pad rows)
        and (x.shape[1] + 2) * x.shape[2] * x.shape[3]
        * jnp.dtype(x.dtype).itemsize <= 8 * 1024 * 1024
    )
    if usable:
        return _pallas_gn_silu_conv(x, gn_scale, gn_bias, kernel,
                                    conv_bias, groups, eps)
    return gn_silu_conv_reference(x, gn_scale, gn_bias, kernel, conv_bias,
                                  groups, eps)


def _fwd(x, gn_scale, gn_bias, kernel, conv_bias, groups, eps):
    out = gn_silu_conv(x, gn_scale, gn_bias, kernel, conv_bias, groups,
                       eps)
    return out, (x, gn_scale, gn_bias, kernel, conv_bias)


def _bwd(groups, eps, res, g):
    x, gn_scale, gn_bias, kernel, conv_bias = res
    _, vjp = jax.vjp(
        lambda *a: gn_silu_conv_reference(*a, groups, eps),
        x, gn_scale, gn_bias, kernel, conv_bias)
    return vjp(g)


gn_silu_conv.defvjp(_fwd, _bwd)


class GNParams(flax_nn.Module):
    """Parameter-only stand-in for GroupNormSiLU (same scale/bias tree
    under the same child name), used by the fused ResBlock path."""

    features: int

    @flax_nn.compact
    def __call__(self):
        return (self.param("scale", flax_nn.initializers.ones,
                           (self.features,)),
                self.param("bias", flax_nn.initializers.zeros,
                           (self.features,)))


class ConvParams(flax_nn.Module):
    """Parameter-only stand-in for a 3x3 nn.Conv (same kernel/bias tree
    under the same child name)."""

    in_features: int
    features: int
    kernel_init: any = flax_nn.initializers.lecun_normal()

    @flax_nn.compact
    def __call__(self):
        return (self.param("kernel", self.kernel_init,
                           (3, 3, self.in_features, self.features)),
                self.param("bias", flax_nn.initializers.zeros,
                           (self.features,)))
