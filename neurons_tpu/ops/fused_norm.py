"""Fused GroupNorm + SiLU — Pallas TPU kernel with XLA fallback.

The GN->SiLU(->conv) chains around every ResBlock conv are the UNet's
HBM-bound hot path (SURVEY.md section 2f: the reference leans on cuDNN +
eager torch here; BASELINE names the fused kernel as a target). The Pallas
kernel computes both reduction moments and the normalize+SiLU in ONE pass
over VMEM-resident data — a single HBM read + write per element instead of
XLA's separate reduce and elementwise passes.

Layout: NHWC. Grid over batch; each program owns one sample's [H*W, C]
tile. Group statistics ride the MXU via a one-hot [C, G] assignment matrix
(2-D matmuls instead of awkward lane-dim reshapes). Falls back to the XLA
composite when the per-sample tile exceeds VMEM (e.g. the 768x768 VAE
decode) or off-TPU.

Forward-only fusion: under `jax.grad` the custom_vjp re-runs the XLA
composite for the backward, keeping training exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as flax_nn
import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Per-sample cap for the fused path (bytes of the fp32 work tile). The
# kernel's scoped-VMEM footprint is ~4x the tile (bf16 in + fp32 work +
# out + padding) against a 16 MB scoped budget, so 3 MB keeps headroom;
# larger tiles (e.g. 96x96x320) fall back to the XLA composite, which is
# already HBM-bound there.
_VMEM_LIMIT = 3 * 1024 * 1024

# single shared backend check (re-exported here for fused_conv)
from neurons_tpu.ops.attention import _on_tpu  # noqa: E402


def group_norm_silu_reference(x: jax.Array, scale: jax.Array,
                              bias: jax.Array, groups: int,
                              eps: float = 1e-5) -> jax.Array:
    """XLA composite: GroupNorm over (H, W, C/G) then SiLU. x [N, H, W, C].

    Statistics are reduced channel-wise FIRST ([N, C], tiny) and only then
    group-summed, so the full activation is never viewed as
    [N, HW, G, C/G] — that grouped reshape forced XLA into layout-change
    copies of the whole tensor around every ResBlock norm (profiled on
    v5e: ~0.4 s/clip of 'data formatting'). Variance stays two-pass on
    centered values (single-pass E[x^2]-mean^2 cancels catastrophically)."""
    xn = _group_norm_core(x, scale, bias, groups, eps)
    return xn * jax.nn.sigmoid(xn)


def _group_norm_core(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     groups: int, eps: float) -> jax.Array:
    """Shared normalize core, output in x.dtype.

    f32 inputs: everything f32 (the parity-test path). Low-precision
    inputs (the bf16 bench pipeline): statistics accumulate in f32 via
    reduction dtypes / einsum accumulation — WITHOUT materializing an
    f32 copy of the activation — and the center/scale/bias apply stays in
    the input dtype. Keeping the elementwise chain bf16 lets XLA keep the
    producing/consuming convs bf16 too (profiled on v5e: the f32 upcast
    here turned whole conv fusions f32, ~2x the HBM bytes)."""
    n, h, w, c = x.shape
    cg = c // groups
    inv_count = 1.0 / (h * w * cg)

    def per_group(v_c):  # [N, C] channel sums -> [N, C] per-group broadcast
        v_g = v_c.reshape(n, groups, cg).sum(axis=-1)
        return jnp.repeat(v_g, cg, axis=-1)

    if x.dtype == jnp.float32:
        mean_c = per_group(x.sum(axis=(1, 2))) * inv_count    # [N, C]
        xc = x - mean_c[:, None, None]
        var_c = per_group((xc * xc).sum(axis=(1, 2))) * inv_count
        inv_c = jax.lax.rsqrt(var_c + eps)
        return xc * (inv_c * scale)[:, None, None] + bias[None, None, None]

    mean_c = per_group(jnp.sum(x, axis=(1, 2),
                               dtype=jnp.float32)) * inv_count
    xc = x - mean_c[:, None, None].astype(x.dtype)
    # squared sums with f32 ACCUMULATION of bf16 products (einsum maps to
    # the native MXU/VPU mixed-precision reduce; no f32 activation copy)
    sq = jnp.einsum("nhwc,nhwc->nc", xc, xc,
                    preferred_element_type=jnp.float32)
    var_c = per_group(sq) * inv_count
    inv_c = jax.lax.rsqrt(var_c + eps)
    a = (inv_c * scale.astype(jnp.float32)).astype(x.dtype)
    return xc * a[:, None, None] + bias[None, None, None].astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, assign_ref, o_ref, *, eps: float,
            inv_count: float):
    x = x_ref[...].astype(jnp.float32)          # [HW, C] (None dim squeezed)
    assign = assign_ref[...]                    # [C, G] one-hot
    s = jnp.sum(x, axis=0, keepdims=True)       # [1, C]
    gsum = jax.lax.dot_general(s, assign, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mean = gsum * inv_count                     # [1, G]
    # broadcast group means back to channels: [1, G] @ [G, C]
    mean_c = jax.lax.dot_general(mean, assign.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    # two-pass variance on the CENTERED values (x stays VMEM-resident, so
    # the second pass is free of HBM traffic): the single-pass
    # E[x^2]-mean^2 form cancels catastrophically for large-mean channels
    xc = x - mean_c
    s2 = jnp.sum(xc * xc, axis=0, keepdims=True)
    gvar = jax.lax.dot_general(s2, assign, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(gvar * inv_count + eps)
    inv_c = jax.lax.dot_general(inv, assign.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = xc * inv_c * scale_ref[...] + bias_ref[...]
    o_ref[...] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def _pallas_gn_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    groups: int, eps: float = 1e-5,
                    interpret: bool = False) -> jax.Array:
    n, h, w, c = x.shape
    hw = h * w
    xf = x.reshape(n, hw, c)
    assign = jnp.asarray(np.kron(np.eye(groups),
                                 np.ones((c // groups, 1))), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps,
                          inv_count=1.0 / (hw * (c // groups))),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, c), bias.reshape(1, c), assign)
    return out.reshape(n, h, w, c)


def _fused_enabled() -> bool:
    import os
    return os.environ.get("NEURONS_TPU_FUSED_NORM", "0") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    groups: int, eps: float = 1e-5) -> jax.Array:
    """Fused GN+SiLU. x [N, H, W, C], scale/bias [C].

    The Pallas path is OPT-IN (NEURONS_TPU_FUSED_NORM=1): end-to-end
    bench showed the custom call acts as a fusion barrier in the UNet
    (XLA fuses the composite's elementwise tail into the next conv),
    costing ~1 s/clip at stage-3/5 shapes despite winning in isolation."""
    usable = (
        _HAS_PALLAS and _on_tpu() and _fused_enabled()
        and x.shape[1] * x.shape[2] * x.shape[3] * 4 <= _VMEM_LIMIT
        and x.shape[3] % groups == 0
    )
    if usable:
        return _pallas_gn_silu(x, scale, bias, groups, eps)
    return group_norm_silu_reference(x, scale, bias, groups, eps)


def _fwd(x, scale, bias, groups, eps):
    return group_norm_silu(x, scale, bias, groups, eps), (x, scale, bias)


def _bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: group_norm_silu_reference(x, s, b, groups, eps),
        x, scale, bias)
    return vjp(g)


group_norm_silu.defvjp(_fwd, _bwd)


def group_norm_reference(x: jax.Array, scale: jax.Array, bias: jax.Array,
                         groups: int, eps: float = 1e-5) -> jax.Array:
    """Reshape-free GroupNorm (no activation), same stats scheme as
    `group_norm_silu_reference`. x [N, H, W, C]."""
    return _group_norm_core(x, scale, bias, groups, eps)


class GroupNorm(flax_nn.Module):
    """Drop-in for flax `nn.GroupNorm` (identical scale/bias param tree)
    built on the reshape-free composite — avoids the [N, HW, G, C/G]
    grouped view that forces whole-tensor layout copies on TPU."""

    num_groups: int
    epsilon: float = 1e-6

    @flax_nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", flax_nn.initializers.ones, (c,))
        bias = self.param("bias", flax_nn.initializers.zeros, (c,))
        if x.ndim == 4:
            return group_norm_reference(x, scale, bias, self.num_groups,
                                        self.epsilon)
        orig = x.shape
        x4 = x.reshape((orig[0], 1, -1, c))
        y = group_norm_reference(x4, scale, bias, self.num_groups,
                                 self.epsilon)
        return y.reshape(orig)


class GroupNormSiLU(flax_nn.Module):
    """Drop-in for `nn.GroupNorm(...)` + `nn.silu`: identical param tree
    (scale/bias of shape [C]) so checkpoints and weight importers are
    unchanged; routes through the fused Pallas kernel on TPU."""

    num_groups: int
    epsilon: float = 1e-6

    @flax_nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", flax_nn.initializers.ones, (c,))
        bias = self.param("bias", flax_nn.initializers.zeros, (c,))
        if x.ndim == 4:
            return group_norm_silu(x, scale, bias, self.num_groups,
                                   self.epsilon)
        orig = x.shape
        x4 = x.reshape((orig[0], 1, -1, c))
        y = group_norm_silu(x4, scale, bias, self.num_groups, self.epsilon)
        return y.reshape(orig)
