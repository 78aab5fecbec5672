"""SD-unCLIP denoising UNet (OpenAI-style UNetModel), flax/NHWC.

Re-design of the reference's sgm UNet (reference generative_models/sgm/
modules/diffusionmodules/openaimodel.py:472-853, configured by
unclip6.yaml:47-63): model_channels 320, channel_mult (1,2,4),
2 res blocks/level, spatial transformers of depth (–,2,10) at downsample
factors 2 and 4, CLIP-bigG 1664-d cross-attention context, and a
1024-d "adm" vector conditioning added to the timestep embedding
(num_classes='sequential').

TPU notes: NHWC convs; attention sites route through
ops.attention.dot_product_attention (Pallas flash kernel on TPU — this
UNet replaces the reference's xformers/softmax-xformers attention,
sgm/modules/attention.py:417-439). The timestep embedding uses the OpenAI
ordering cat(cos, sin) — distinct from the prior's sin-first embedding.
All blocks are rematerialization-friendly: wrap the call in
`jax.checkpoint` at the sampler level to trade FLOPs for HBM.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import UNet2DConfig
from neurons_tpu.ops.attention import dot_product_attention
from neurons_tpu.ops.fused_norm import GroupNorm, GroupNormSiLU


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """OpenAI UNet convention: cat(cos, sin) (openaimodel timestep_embedding).
    t: [B] (float timesteps or sigma indices)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def zero_init():
    return nn.initializers.zeros


def cross_attn_sites(cfg: UNet2DConfig):
    """[(site_name, transformer_depth)] in call order — the SpatialTransformer
    sites of `UNetModel.__call__` (must mirror its loop structure)."""
    sites = []
    ds = 1
    for level in range(len(cfg.channel_mult)):
        for i in range(cfg.num_res_blocks):
            if ds in cfg.attention_resolutions:
                sites.append((f"down_{level}_attn_{i}",
                              cfg.transformer_depth[level]))
        if level != len(cfg.channel_mult) - 1:
            ds *= 2
    sites.append(("mid_attn", cfg.transformer_depth[-1]))
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            if ds in cfg.attention_resolutions:
                sites.append((f"up_{level}_attn_{i}",
                              cfg.transformer_depth[level]))
            if level and i == cfg.num_res_blocks:
                ds //= 2
    return sites


def precompute_context_kv(params, context: jax.Array, cfg: UNet2DConfig):
    """Hoist every cross-attn site's K/V projection of `context` out of the
    sampling loop (exact — the context is constant across steps, so
    k = ctx @ W_k is step-invariant). Returns {site: (k, v)} with k/v of
    shape [depth, B, Tk, inner]; feed as `UNetModel.__call__(ctx_kv=...)`.

    `params` is the UNet "params" tree (same names as the module tree)."""
    out = {}
    for name, depth in cross_attn_sites(cfg):
        site = params[name]
        ks, vs = [], []
        for j in range(depth):
            attn = site[f"block_{j}"]["attn2"]
            ks.append(context @ attn["to_k"]["kernel"])
            vs.append(context @ attn["to_v"]["kernel"])
        out[name] = (jnp.stack(ks), jnp.stack(vs))
    return out


class ResBlock(nn.Module):
    """GN32 -> SiLU -> conv; + time-emb; GN32 -> SiLU -> zero-conv; skip."""

    out_channels: int
    groups: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        from neurons_tpu.ops import fused_conv as fc

        residual = x
        fused = fc._enabled()
        # eps 1e-5: torch GroupNorm default (reference GroupNorm32)
        if fused:
            gs, gb = fc.GNParams(x.shape[-1], name="in_norm")()
            k1, b1 = fc.ConvParams(x.shape[-1], self.out_channels,
                                   name="in_conv")()
            h = fc.gn_silu_conv(x, gs, gb, k1, b1, self.groups, 1e-5)
        else:
            h = GroupNormSiLU(num_groups=self.groups, epsilon=1e-5,
                              name="in_norm")(x)
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        name="in_conv")(h)
        e = nn.Dense(self.out_channels, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        # the second pair fuses only when dropout is inert (inference):
        # the reference order is GN -> SiLU -> dropout -> conv
        if fused and (deterministic or self.dropout == 0.0):
            gs2, gb2 = fc.GNParams(self.out_channels, name="out_norm")()
            k2, b2 = fc.ConvParams(self.out_channels, self.out_channels,
                                   kernel_init=zero_init(),
                                   name="out_conv")()
            h = fc.gn_silu_conv(h, gs2, gb2, k2, b2, self.groups, 1e-5)
        else:
            h = GroupNormSiLU(num_groups=self.groups, epsilon=1e-5,
                              name="out_norm")(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        kernel_init=zero_init(), name="out_conv")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1),
                               name="skip_conv")(residual)
        return residual + h


class CrossAttention(nn.Module):
    """Multi-head attention, optionally cross (context != None).

    `kv`: optional precomputed (k, v) projections of the context, each
    [B, Tk, inner] — the cross-attn context is constant over all sampler
    steps, so its K/V projections can be hoisted out of the sampling
    `lax.scan` (exact; see `precompute_context_kv`)."""

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, kv=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        if kv is not None:
            k, v = kv
        else:
            k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        b, tq, _ = q.shape
        tk = k.shape[1]

        def split(y, t):
            return y.reshape(b, t, self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q, tq), split(k, tk), split(v, tk))
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, inner)
        return nn.Dense(self.query_dim, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, name="proj_in")(x)
        val, gate = jnp.split(h, 2, axis=-1)
        # reference sgm GEGLU uses exact (erf) GELU, not tanh-approximate
        return nn.Dense(self.dim, name="proj_out")(
            val * nn.gelu(gate, approximate=False))


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> FF, each pre-norm residual
    (reference sgm/modules/attention.py:456-618 BasicTransformerBlock).

    Cross-attn caching hooks (TGATE, arXiv 2404.02747 — see PAPERS.md):
    `xattn_cached` replaces the cross-attn residual branch with a cached
    tensor (the whole norm2+attn2 computation is skipped); `capture=True`
    additionally returns that residual branch so a sampler can cache it."""

    dim: int
    heads: int
    dim_head: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context, kv=None, xattn_cached=None,
                 capture: bool = False, sattn_cached=None,
                 capture_sattn: bool = False):
        # spatial self-attn residual broadcast (PAB, arXiv 2408.12588)
        if sattn_cached is not None:
            sattn = sattn_cached
        else:
            sattn = CrossAttention(self.dim, self.heads, self.dim_head,
                                   name="attn1")(
                nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = sattn + x
        if xattn_cached is not None:
            xattn = xattn_cached
        else:
            xattn = CrossAttention(self.dim, self.heads, self.dim_head,
                                   context_dim=self.context_dim, name="attn2")(
                nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context, kv=kv)
        x = xattn + x
        x = GEGLUFeedForward(self.dim, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)) + x
        extras = ()
        if capture:
            extras += (xattn,)
        if capture_sattn:
            extras += (sattn,)
        if extras:
            return (x,) + extras
        return x


class SpatialTransformer(nn.Module):
    """GN32 -> (linear) proj_in -> depth x BasicTransformerBlock ->
    zero proj_out -> residual (reference sgm/modules/attention.py:619-759)."""

    channels: int
    heads: int
    dim_head: int
    depth: int
    context_dim: int
    use_linear: bool = True
    groups: int = 32

    @nn.compact
    def __call__(self, x, context, ctx_kv=None, xattn_cached=None,
                 capture: bool = False, sattn_cached=None,
                 capture_sattn: bool = False):
        b, h, w, c = x.shape
        residual = x
        t = GroupNorm(num_groups=self.groups, epsilon=1e-6,
                      name="norm")(x).reshape(b, h * w, c)
        t = nn.Dense(c, name="proj_in")(t)
        captured = []
        captured_s = []
        for i in range(self.depth):
            kv = None if ctx_kv is None else (ctx_kv[0][i], ctx_kv[1][i])
            cached = None if xattn_cached is None else xattn_cached[i]
            s_cached = None if sattn_cached is None else sattn_cached[i]
            out = BasicTransformerBlock(c, self.heads, self.dim_head,
                                        self.context_dim,
                                        name=f"block_{i}")(
                t, context, kv=kv, xattn_cached=cached, capture=capture,
                sattn_cached=s_cached, capture_sattn=capture_sattn)
            if capture or capture_sattn:
                rest = list(out[1:])
                t = out[0]
                if capture:
                    captured.append(rest.pop(0))
                if capture_sattn:
                    captured_s.append(rest.pop(0))
            else:
                t = out
        t = nn.Dense(c, kernel_init=zero_init(), name="proj_out")(t)
        out = t.reshape(b, h, w, c) + residual
        extras = ()
        if capture:
            extras += (jnp.stack(captured),)
        if capture_sattn:
            extras += (jnp.stack(captured_s),)
        if extras:
            return (out,) + extras
        return out


class Downsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=2, padding=1,
                       name="op")(x)


class UpsampleConv(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


class UNetModel(nn.Module):
    """Inputs (NCHW boundary): x [B, 4, H, W], timesteps [B],
    context [B, T, context_dim], y [B, adm_in_channels].

    Encoder-feature reuse ("Faster Diffusion", arXiv 2312.09608 — the
    down-block features of adjacent denoising steps are nearly identical):
    pass `return_cache=True` to also get the (h, skips) encoder cache, and
    `cached=(h, skips)` to skip the encoder and run mid+decoder only with
    the fresh timestep embedding. All submodules carry explicit names, so
    both partial paths address the same parameter tree."""

    cfg: UNet2DConfig

    @nn.compact
    def __call__(self, x, timesteps, context, y=None,
                 deterministic: bool = True, cached=None,
                 return_cache: bool = False, ctx_kv=None,
                 xattn_cached=None, capture_xattn: bool = False,
                 sattn_cached=None, capture_sattn: bool = False,
                 deep_cached=None, return_deep_cache: bool = False):
        c = self.cfg
        time_embed_dim = c.model_channels * 4
        xattn_out = {}
        sattn_out = {}

        def attn_site(name, h, ch, depth):
            """SpatialTransformer site with the caching hooks threaded."""
            res = SpatialTransformer(
                ch, heads_of(ch), c.num_head_channels,
                depth, c.context_dim,
                groups=groups, name=name)(
                    h, context,
                    ctx_kv=None if ctx_kv is None else ctx_kv[name],
                    xattn_cached=(None if xattn_cached is None
                                  else xattn_cached[name]),
                    capture=capture_xattn,
                    sattn_cached=(None if sattn_cached is None
                                  else sattn_cached[name]),
                    capture_sattn=capture_sattn)
            if capture_xattn or capture_sattn:
                rest = list(res[1:])
                res = res[0]
                if capture_xattn:
                    xattn_out[name] = rest.pop(0)
                if capture_sattn:
                    sattn_out[name] = rest.pop(0)
            return res

        emb = timestep_embedding(timesteps, c.model_channels)
        emb = nn.Dense(time_embed_dim, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, name="time_embed_2")(nn.silu(emb))
        if y is not None:
            lab = nn.Dense(time_embed_dim, name="label_emb_0")(y)
            lab = nn.Dense(time_embed_dim, name="label_emb_2")(nn.silu(lab))
            emb = emb + lab
        # timestep_embedding computes in f32; without this cast the f32
        # would promote every downstream conv/attention to f32 (2x MXU
        # cost in a bf16 pipeline — profiled on v5e)
        emb = emb.astype(x.dtype)

        heads_of = lambda ch: ch // c.num_head_channels
        groups = 32 if c.model_channels % 32 == 0 else c.model_channels

        # DeepCache (arXiv 2312.00858): `deep_cached` is the up-path
        # feature entering the level-0 up blocks from a previous full
        # step; a cached step recomputes ONLY the shallow level-0 blocks
        # (conv_in, level-0 down/up ResBlocks, out head) — the depth-10
        # mid transformer and every deeper level are skipped.
        deep_only = deep_cached is not None
        if cached is None:
            h = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
            h = nn.Conv(c.model_channels, (3, 3), padding=1,
                        name="conv_in")(h)
            skips = [h]
            ds = 1
            # --- input blocks ---
            for level, mult in enumerate(c.channel_mult):
                if deep_only and level > 0:
                    break
                ch = c.model_channels * mult
                for i in range(c.num_res_blocks):
                    h = ResBlock(ch, groups=groups,
                                 name=f"down_{level}_res_{i}")(
                        h, emb, deterministic)
                    if ds in c.attention_resolutions:
                        h = attn_site(f"down_{level}_attn_{i}", h, ch,
                                      c.transformer_depth[level])
                    skips.append(h)
                if level != len(c.channel_mult) - 1 and not deep_only:
                    h = Downsample2D(ch, name=f"down_{level}_downsample")(h)
                    skips.append(h)
                    ds *= 2
        else:
            h, skip_tuple = cached
            skips = list(skip_tuple)
            ds = 2 ** (len(c.channel_mult) - 1)
        cache = (h, tuple(skips))

        if not deep_only:
            # --- middle ---
            ch = c.model_channels * c.channel_mult[-1]
            h = ResBlock(ch, groups=groups, name="mid_res_0")(
                h, emb, deterministic)
            h = attn_site("mid_attn", h, ch, c.transformer_depth[-1])
            h = ResBlock(ch, groups=groups, name="mid_res_1")(
                h, emb, deterministic)
        deep_out = None

        # --- output blocks ---
        for level, mult in reversed(list(enumerate(c.channel_mult))):
            if deep_only and level > 0:
                continue
            ch = c.model_channels * mult
            for i in range(c.num_res_blocks + 1):
                if level == 0 and i == 0:
                    if deep_only:
                        h = deep_cached
                    deep_out = h
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(ch, groups=groups,
                             name=f"up_{level}_res_{i}")(h, emb, deterministic)
                if ds in c.attention_resolutions:
                    h = attn_site(f"up_{level}_attn_{i}", h, ch,
                                  c.transformer_depth[level])
                if level and i == c.num_res_blocks:
                    h = UpsampleConv(ch, name=f"up_{level}_upsample")(h)
                    ds //= 2

        from neurons_tpu.ops import fused_conv as fc
        if fc._enabled():
            gs, gb = fc.GNParams(h.shape[-1], name="out_norm")()
            k, b = fc.ConvParams(h.shape[-1], c.out_channels,
                                 kernel_init=zero_init(),
                                 name="out_conv")()
            h = fc.gn_silu_conv(h, gs, gb, k, b, groups, 1e-5)
        else:
            h = GroupNormSiLU(num_groups=groups, epsilon=1e-5,
                              name="out_norm")(h)
            h = nn.Conv(c.out_channels, (3, 3), padding=1,
                        kernel_init=zero_init(), name="out_conv")(h)
        out = h.transpose(0, 3, 1, 2)  # -> NCHW
        extras = ()
        if return_cache:
            extras += (cache,)
        if return_deep_cache:
            extras += (deep_out,)
        if capture_xattn:
            extras += (xattn_out,)
        if capture_sattn:
            extras += (sattn_out,)
        if extras:
            return (out,) + extras
        return out
