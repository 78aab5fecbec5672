"""SVD spatiotemporal UNet (`VideoUNet`), flax/NHWC — TPU-native.

Re-design of the reference's Stability video-diffusion UNet
(reference generative_models/sgm/modules/diffusionmodules/video_model.py:
84-493 `VideoUNet`/`VideoResBlock`, sgm/modules/video_attention.py:15-301
`VideoTransformerBlock`/`SpatialVideoTransformer`, AlphaBlender at
sgm/modules/diffusionmodules/util.py:312-369). The reference ships this
for SVD; NEURONS' live stages never call it, but it completes the sgm
surface so an sgm user finds the full engine here.

TPU design notes:
- Layouts: the public boundary is the reference's `[(B·T), C, H, W]`
  NCHW batch-of-frames; spatial compute runs NHWC `[(B·T), H, W, C]`
  (same folded layout as models/unet2d.py — conv-friendly, no data
  movement beyond the boundary transpose); temporal compute reshapes to
  `[B, T, H, W, C]` (3-D convs run NDHWC with T as depth — XLA maps
  these straight to the MXU) and `[(B·S), T, C]` for temporal attention
  (a pure view off the `[(B·T), S, C]` spatial token layout — one
  transpose, fused by XLA).
- Attention (spatial + temporal) routes through
  ops.attention.dot_product_attention — the Pallas flash kernel on TPU,
  replacing the reference's xformers/softmax-xformers dispatch.
- Frame-axis sharding: the `[B, T, ...]` temporal layout keeps T as a
  leading named axis so GSPMD can shard frames over a `frame` mesh axis;
  temporal attention then all-gathers only the tiny per-pixel T-sequence.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import VideoUNetConfig
from neurons_tpu.models.unet2d import (BasicTransformerBlock, CrossAttention,
                                       Downsample2D, GEGLUFeedForward,
                                       ResBlock, UpsampleConv,
                                       timestep_embedding, zero_init)
from neurons_tpu.ops.fused_norm import GroupNorm, GroupNormSiLU


class AlphaBlender(nn.Module):
    """alpha·spatial + (1-alpha)·temporal (reference sgm/modules/
    diffusionmodules/util.py:312-369). `image_only_indicator` [B, T]
    forces alpha=1 (pure spatial) for frames flagged as stills
    ('learned_with_images')."""

    merge_strategy: str = "learned_with_images"
    alpha: float = 0.5
    # broadcast shape of alpha relative to the mixed tensors:
    #   "video": [B, T, H, W, C] -> alpha [B, T, 1, 1, 1]
    #   "seq":   [(B·T), S, C]   -> alpha [(B·T), 1, 1]
    layout: str = "video"

    @nn.compact
    def __call__(self, x_spatial, x_temporal,
                 image_only_indicator: Optional[jax.Array] = None):
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, x_spatial.dtype)
        else:
            mix = self.param("mix_factor", nn.initializers.constant(self.alpha),
                             (1,))
            alpha = jax.nn.sigmoid(mix.astype(jnp.float32))[0]
            if self.merge_strategy == "learned_with_images":
                assert image_only_indicator is not None, (
                    "learned_with_images needs image_only_indicator [B, T]")
                alpha = jnp.where(image_only_indicator.astype(bool), 1.0, alpha)
                if self.layout == "video":
                    alpha = alpha[:, :, None, None, None]
                else:  # seq: flatten (B, T) into the folded frame batch
                    alpha = alpha.reshape(-1)[:, None, None]
            elif self.merge_strategy != "learned":
                raise ValueError(self.merge_strategy)
        alpha = jnp.asarray(alpha, x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class TemporalResBlock(nn.Module):
    """The `time_stack` res block: GN32+SiLU -> 3-D conv (T,kh,kw) ->
    (+emb) -> GN32+SiLU -> zero 3-D conv, residual (reference
    openaimodel.py ResBlock with dims=3; used at video_model.py:42-55 with
    per-frame emb and at temporal_ae.py:32-44 with skip_t_emb).

    x: [B, T, H, W, C] (NDHWC — T is the conv depth axis);
    emb: [B, T, E] or None."""

    out_channels: int
    kernel: Tuple[int, int, int] = (3, 1, 1)
    groups: int = 32
    use_emb: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, emb=None):
        pad = [(k // 2, k // 2) for k in self.kernel]
        h = GroupNormSiLU(num_groups=self.groups, epsilon=self.eps,
                          name="in_norm")(x)
        h = nn.Conv(self.out_channels, self.kernel, padding=pad,
                    name="in_conv")(h)
        if self.use_emb:
            e = nn.Dense(self.out_channels, name="emb_proj")(nn.silu(emb))
            # per-frame emb broadcast over H, W (the reference's
            # exchange_temb_dims rearrange in NCTHW; trivial in NTHWC)
            h = h + e[:, :, None, None, :].astype(h.dtype)
        h = GroupNormSiLU(num_groups=self.groups, epsilon=self.eps,
                          name="out_norm")(h)
        h = nn.Conv(self.out_channels, self.kernel, padding=pad,
                    kernel_init=zero_init(), name="out_conv")(h)
        residual = x
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1, 1),
                               name="skip_conv")(residual)
        return residual + h


class VideoResBlock(nn.Module):
    """Spatial ResBlock + temporal res stack + alpha blend (reference
    video_model.py:12-81)."""

    out_channels: int
    kernel: Tuple[int, int, int] = (3, 1, 1)
    groups: int = 32
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5

    @nn.compact
    def __call__(self, x, emb, num_frames: int,
                 image_only_indicator: Optional[jax.Array] = None,
                 deterministic: bool = True):
        x = ResBlock(self.out_channels, groups=self.groups,
                     name="spatial")(x, emb, deterministic)
        bt, h, w, c = x.shape
        b = bt // num_frames
        xv = x.reshape(b, num_frames, h, w, c)
        xt = TemporalResBlock(self.out_channels, kernel=self.kernel,
                              groups=self.groups, name="time_stack")(
            xv, emb.reshape(b, num_frames, -1))
        xm = AlphaBlender(self.merge_strategy, self.merge_factor,
                          layout="video", name="time_mixer")(
            xv, xt, image_only_indicator)
        return xm.reshape(bt, h, w, c)


class VideoTransformerBlock(nn.Module):
    """Temporal transformer block over per-pixel frame sequences
    (reference video_attention.py:15-143): optional ff_in, temporal
    self-attn, temporal cross-attn on `time_context`, GEGLU FF — all
    pre-norm residual. x: [(B·S), T, C]."""

    dim: int
    heads: int
    dim_head: int
    context_dim: int = 0
    ff_in: bool = False
    disable_temporal_crossattention: bool = False
    switch_temporal_ca_to_sa: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        if self.ff_in:
            x = GEGLUFeedForward(self.dim, name="ff_in")(
                nn.LayerNorm(epsilon=1e-5, name="norm_in")(x)) + x
        x = CrossAttention(self.dim, self.heads, self.dim_head,
                           name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)) + x
        if not self.disable_temporal_crossattention:
            ctx = None if self.switch_temporal_ca_to_sa else context
            x = CrossAttention(self.dim, self.heads, self.dim_head,
                               context_dim=self.context_dim or None,
                               name="attn2")(
                nn.LayerNorm(epsilon=1e-5, name="norm2")(x), ctx) + x
        x = GEGLUFeedForward(self.dim, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)) + x
        return x


class SpatialVideoTransformer(nn.Module):
    """Spatial transformer with an interleaved temporal mix stack
    (reference video_attention.py:146-301): per depth, a spatial
    BasicTransformerBlock then a VideoTransformerBlock over frames with a
    sinusoidal frame-position MLP, alpha-blended."""

    channels: int
    heads: int
    dim_head: int
    depth: int
    context_dim: int
    time_context_dim: int = 0
    use_spatial_context: bool = True
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    ff_in: bool = False
    disable_temporal_crossattention: bool = False
    max_time_embed_period: int = 10000
    groups: int = 32

    @nn.compact
    def __call__(self, x, context, num_frames: int,
                 time_context: Optional[jax.Array] = None,
                 image_only_indicator: Optional[jax.Array] = None):
        bt, hh, ww, c = x.shape
        s = hh * ww
        b = bt // num_frames
        residual = x

        time_ctx_dim = self.time_context_dim
        if self.use_spatial_context:
            # first frame's context, repeated per spatial position
            # (video_attention.py:249-253)
            time_context = jnp.repeat(context[::num_frames], s, axis=0)
            time_ctx_dim = self.context_dim
        elif time_context is not None:
            if time_context.ndim == 2:
                time_context = time_context[:, None, :]
            time_context = jnp.repeat(time_context, s, axis=0)

        t = GroupNorm(num_groups=self.groups, epsilon=1e-6,
                      name="norm")(x).reshape(bt, s, c)
        t = nn.Dense(c, name="proj_in")(t)

        frames = jnp.tile(jnp.arange(num_frames), b)
        emb = timestep_embedding(frames, c,
                                 max_period=self.max_time_embed_period)
        emb = nn.Dense(c * 4, name="time_pos_embed_0")(emb)
        emb = nn.Dense(c, name="time_pos_embed_2")(nn.silu(emb))
        emb = emb[:, None, :].astype(t.dtype)  # [(B·T), 1, C]

        for i in range(self.depth):
            t = BasicTransformerBlock(c, self.heads, self.dim_head,
                                      self.context_dim,
                                      name=f"block_{i}")(t, context)
            # frames-as-sequence view: [(B·T), S, C] -> [(B·S), T, C]
            mix = (t + emb).reshape(b, num_frames, s, c) \
                .transpose(0, 2, 1, 3).reshape(b * s, num_frames, c)
            mix = VideoTransformerBlock(
                c, self.heads, self.dim_head, context_dim=time_ctx_dim,
                ff_in=self.ff_in,
                disable_temporal_crossattention=(
                    self.disable_temporal_crossattention),
                name=f"time_stack_{i}")(mix, time_context)
            mix = mix.reshape(b, s, num_frames, c) \
                .transpose(0, 2, 1, 3).reshape(bt, s, c)
            t = AlphaBlender(self.merge_strategy, self.merge_factor,
                             layout="seq", name="time_mixer")(
                t, mix, image_only_indicator)

        t = nn.Dense(c, kernel_init=zero_init(), name="proj_out")(t)
        return t.reshape(bt, hh, ww, c) + residual


class VideoUNet(nn.Module):
    """Inputs (NCHW boundary, frames folded into batch):
      x [(B·T), C, H, W], timesteps [(B·T)], context [(B·T), Tk, ctx_dim],
      y [(B·T), adm_in_channels] or None, num_frames T,
      image_only_indicator [B, T] or None (defaults to all-video).

    Mirrors reference video_model.py:442-493 forward: time embed (+adm),
    input blocks (VideoResBlock + SpatialVideoTransformer at attention
    resolutions), middle, skip-cat output blocks, GN+SiLU+zero-conv out.
    """

    cfg: VideoUNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context, y=None, num_frames: int = 1,
                 image_only_indicator: Optional[jax.Array] = None,
                 deterministic: bool = True):
        c = self.cfg
        if image_only_indicator is None:
            image_only_indicator = jnp.zeros(
                (x.shape[0] // num_frames, num_frames), jnp.float32)
        time_embed_dim = c.model_channels * 4
        heads_of = lambda ch: ch // c.num_head_channels
        groups = 32 if c.model_channels % 32 == 0 else c.model_channels

        def res(name, h, ch):
            return VideoResBlock(
                ch, kernel=tuple(c.video_kernel_size), groups=groups,
                merge_strategy=c.merge_strategy,
                merge_factor=c.merge_factor, name=name)(
                h, emb, num_frames, image_only_indicator, deterministic)

        def attn(name, h, ch, depth):
            return SpatialVideoTransformer(
                ch, heads_of(ch), c.num_head_channels, depth,
                c.context_dim, time_context_dim=c.time_context_dim,
                use_spatial_context=c.use_spatial_context,
                merge_strategy=c.merge_strategy,
                merge_factor=c.merge_factor,
                ff_in=c.extra_ff_mix_layer,
                disable_temporal_crossattention=(
                    c.disable_temporal_crossattention),
                max_time_embed_period=c.max_ddpm_temb_period,
                groups=groups, name=name)(
                h, context, num_frames,
                image_only_indicator=image_only_indicator)

        emb = timestep_embedding(timesteps, c.model_channels)
        emb = nn.Dense(time_embed_dim, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, name="time_embed_2")(nn.silu(emb))
        if y is not None:
            lab = nn.Dense(time_embed_dim, name="label_emb_0")(y)
            lab = nn.Dense(time_embed_dim, name="label_emb_2")(nn.silu(lab))
            emb = emb + lab
        emb = emb.astype(x.dtype)  # keep the bf16 pipeline bf16

        h = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        h = nn.Conv(c.model_channels, (3, 3), padding=1, name="conv_in")(h)
        skips = [h]
        ds = 1
        for level, mult in enumerate(c.channel_mult):
            ch = c.model_channels * mult
            for i in range(c.num_res_blocks):
                h = res(f"down_{level}_res_{i}", h, ch)
                if ds in c.attention_resolutions:
                    h = attn(f"down_{level}_attn_{i}", h, ch,
                             c.transformer_depth[level])
                skips.append(h)
            if level != len(c.channel_mult) - 1:
                h = Downsample2D(ch, name=f"down_{level}_downsample")(h)
                skips.append(h)
                ds *= 2

        ch = c.model_channels * c.channel_mult[-1]
        h = res("mid_res_0", h, ch)
        h = attn("mid_attn", h, ch, c.transformer_depth[-1])
        h = res("mid_res_1", h, ch)

        for level, mult in reversed(list(enumerate(c.channel_mult))):
            ch = c.model_channels * mult
            for i in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res(f"up_{level}_res_{i}", h, ch)
                if ds in c.attention_resolutions:
                    h = attn(f"up_{level}_attn_{i}", h, ch,
                             c.transformer_depth[level])
                if level and i == c.num_res_blocks:
                    h = UpsampleConv(ch, name=f"up_{level}_upsample")(h)
                    ds //= 2

        h = GroupNormSiLU(num_groups=groups, epsilon=1e-5,
                          name="out_norm")(h)
        h = nn.Conv(c.out_channels, (3, 3), padding=1,
                    kernel_init=zero_init(), name="out_conv")(h)
        return h.transpose(0, 3, 1, 2)  # -> NCHW
