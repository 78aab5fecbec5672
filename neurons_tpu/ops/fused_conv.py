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


def _kernel(x_hbm, gh_ref, bh_ref, w_ref, cb_ref, o_ref, xt_ref, xa_ref,
            acc_ref, sem, *, bh: int, hh: int, ww: int, cin: int,
            n_ht: int, n_cot: int):
    n = pl.program_id(0)
    ti = pl.program_id(1)
    cot = pl.program_id(2)

    @pl.when(cot == 0)
    def _load_and_activate():
        # 3 DMAs: body rows + 1-row halos (clamped at the image edges —
        # the out-of-range halo rows are zeroed AFTER activation below)
        body = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(ti * bh, bh)], xt_ref.at[pl.ds(1, bh)], sem)
        body.start()

        @pl.when(ti > 0)
        def _top():
            top = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(ti * bh - 1, 1)], xt_ref.at[pl.ds(0, 1)],
                sem)
            top.start()
            top.wait()

        @pl.when(ti < n_ht - 1)
        def _bot():
            bot = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(ti * bh + bh, 1)],
                xt_ref.at[pl.ds(bh + 1, 1)], sem)
            bot.start()
            bot.wait()

        body.wait()
        g = gh_ref[...].astype(jnp.float32)        # [1, C]
        b = bh_ref[...].astype(jnp.float32)
        xw = xt_ref[...].astype(jnp.float32)       # [bh+2, W, C]
        h = xw * g[:, None, :] + b[:, None, :]
        xa_ref[...] = (h * jax.nn.sigmoid(h)).astype(xa_ref.dtype)

        # conv zero padding applies to the ACTIVATED tensor: zero the
        # out-of-image halo rows after activation
        @pl.when(ti == 0)
        def _zt():
            xa_ref[pl.ds(0, 1), :, :] = jnp.zeros((1, ww, cin),
                                                  xa_ref.dtype)

        @pl.when(ti == n_ht - 1)
        def _zb():
            xa_ref[pl.ds(bh + 1, 1), :, :] = jnp.zeros((1, ww, cin),
                                                       xa_ref.dtype)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    zcol = jnp.zeros((bh, 1, cin), xa_ref.dtype)
    for dy in (-1, 0, 1):
        xs = xa_ref[pl.ds(1 + dy, bh), :, :]       # [bh, W, C]
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
    gamma_hat, beta_hat = _gn_hat(x, gn_scale, gn_bias, groups, eps)
    gamma_hat = gamma_hat.astype(x.dtype)
    beta_hat = beta_hat.astype(x.dtype)
    wflat = kernel.reshape(9, cin, cout).astype(x.dtype)

    bh = _pick_rows(hh)
    esize = jnp.dtype(x.dtype).itemsize
    bco = cout
    while 9 * cin * bco * esize > _W_BUDGET and bco % 2 == 0:
        bco //= 2
    n_ht, n_cot = hh // bh, cout // bco

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, hh=hh, ww=ww, cin=cin,
                          n_ht=n_ht, n_cot=n_cot),
        grid=(n, n_ht, n_cot),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x in HBM
            pl.BlockSpec((1, cin), lambda n, ti, cot: (n, 0)),
            pl.BlockSpec((1, cin), lambda n, ti, cot: (n, 0)),
            pl.BlockSpec((9, cin, bco), lambda n, ti, cot: (0, 0, cot)),
            pl.BlockSpec((1, bco), lambda n, ti, cot: (0, cot)),
        ],
        out_specs=pl.BlockSpec((None, bh, ww, bco),
                               lambda n, ti, cot: (n, ti, 0, cot)),
        out_shape=jax.ShapeDtypeStruct((n, hh, ww, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, ww, cin), x.dtype),        # raw window
            pltpu.VMEM((bh + 2, ww, cin), x.dtype),        # activated
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
        and kernel.shape[0] == kernel.shape[1] == 3
        # two [bh+2, W, C] windows + weights tile must fit comfortably
        and 2 * 10 * x.shape[2] * x.shape[3] * jnp.dtype(x.dtype).itemsize
        <= 6 * 1024 * 1024
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
