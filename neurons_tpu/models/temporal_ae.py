"""SVD temporal VAE decoder, flax/NHWC — TPU-native.

Re-design of the reference's temporal autoencoder decoder (reference
generative_models/sgm/modules/autoencoding/temporal_ae.py:18-349:
`VideoResBlock` wraps every VAE resnet with a (3,3,3) temporal res stack,
`AE3DConv` adds a 3-D time-mix conv after conv_out, `VideoBlock` adds a
temporal transformer to the mid attention, `VideoDecoder` assembles them
over the SD VAE decoder topology). Shipped for SVD; unused by NEURONS'
live stages, but completes the sgm autoencoding surface.

TPU notes: spatial compute on the folded `[(B·T), H, W, C]` NHWC layout;
temporal res/conv stacks reshape to `[B, T, H, W, C]` and run NDHWC 3-D
convs (XLA tiles these on the MXU directly); temporal attention uses the
per-pixel `[(B·S), T, C]` view through the shared Pallas attention op.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import VideoDecoderConfig
from neurons_tpu.models.unet2d import timestep_embedding
from neurons_tpu.models.video_unet import (AlphaBlender, TemporalResBlock,
                                           VideoTransformerBlock)
from neurons_tpu.models.vae import VAEResnetBlock, Upsample
from neurons_tpu.ops.attention import dot_product_attention
from neurons_tpu.ops.fused_norm import GroupNorm, GroupNormSiLU


class VideoVAEResBlock(nn.Module):
    """VAE resnet + temporal res stack + scalar alpha blend (reference
    temporal_ae.py:18-83; the temporal stack is emb-free, skip_t_emb)."""

    out_channels: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    groups: int = 32
    merge_strategy: str = "learned"
    alpha: float = 0.0

    @nn.compact
    def __call__(self, x, num_frames: int):
        x = VAEResnetBlock(self.out_channels, groups=self.groups,
                           name="spatial")(x)
        bt, h, w, c = x.shape
        b = bt // num_frames
        xv = x.reshape(b, num_frames, h, w, c)
        xt = TemporalResBlock(self.out_channels, kernel=self.kernel,
                              groups=self.groups, use_emb=False,
                              name="time_stack")(xv)
        # NOTE: this block's alpha weights the TEMPORAL branch
        # (reference temporal_ae.py:79-80 `alpha*x + (1-alpha)*x_mix` with
        # x = time_stack output) — opposite of the UNet's AlphaBlender.
        xm = AlphaBlender(self.merge_strategy, self.alpha,
                          layout="video", name="time_mixer")(xt, xv)
        return xm.reshape(bt, h, w, c)


class AE3DConv(nn.Module):
    """2-D conv followed by a 3-D time-mix conv (reference
    temporal_ae.py:86-107)."""

    out_channels: int
    kernel: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, x, num_frames: int):
        x = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv")(x)
        bt, h, w, c = x.shape
        b = bt // num_frames
        pad = [(k // 2, k // 2) for k in self.kernel]
        xv = x.reshape(b, num_frames, h, w, c)
        xv = nn.Conv(self.out_channels, self.kernel, padding=pad,
                     name="time_mix_conv")(xv)
        return xv.reshape(bt, h, w, c)


class VideoAttnBlock(nn.Module):
    """VAE mid attention + temporal transformer mix (reference
    temporal_ae.py:110-177 `VideoBlock`): single-head spatial attention,
    then a frame-position-embedded temporal block, alpha-blended before
    the output projection."""

    channels: int
    groups: int = 32
    merge_strategy: str = "learned"
    alpha: float = 0.0

    @nn.compact
    def __call__(self, x, num_frames: int):
        bt, hh, ww, c = x.shape
        s = hh * ww
        b = bt // num_frames
        residual = x
        t = GroupNorm(num_groups=self.groups, epsilon=1e-6,
                      name="norm")(x).reshape(bt, s, c)
        q = nn.Dense(c, name="q")(t)[:, None]
        k = nn.Dense(c, name="k")(t)[:, None]
        v = nn.Dense(c, name="v")(t)[:, None]
        t = dot_product_attention(q, k, v)[:, 0]

        frames = jnp.tile(jnp.arange(num_frames), b)
        emb = timestep_embedding(frames, c)
        emb = nn.Dense(c * 4, name="video_time_embed_0")(emb)
        emb = nn.Dense(c, name="video_time_embed_2")(nn.silu(emb))
        mix = t + emb[:, None, :].astype(t.dtype)
        mix = mix.reshape(b, num_frames, s, c) \
            .transpose(0, 2, 1, 3).reshape(b * s, num_frames, c)
        mix = VideoTransformerBlock(c, heads=1, dim_head=c, ff_in=True,
                                    name="time_mix_block")(mix)
        mix = mix.reshape(b, s, num_frames, c) \
            .transpose(0, 2, 1, 3).reshape(bt, s, c)
        t = AlphaBlender(self.merge_strategy, self.alpha,
                         layout="seq", name="time_mixer")(t, mix)
        t = nn.Dense(c, name="proj_out")(t)
        return residual + t.reshape(bt, hh, ww, c)


class VideoDecoder(nn.Module):
    """SD VAE decoder with temporal stacks (reference temporal_ae.py:
    293-349). Input z [(B·T), C, H, W] NCHW latents, output frames NCHW.
    time_mode: 'all' (temporal convs + attention), 'conv-only' (default,
    SVD), 'attn-only'."""

    cfg: VideoDecoderConfig

    @nn.compact
    def __call__(self, z, num_frames: int):
        c = self.cfg
        v = c.vae
        g = min(v.norm_num_groups, v.block_out_channels[0])
        conv_time = c.time_mode in ("all", "conv-only")
        attn_time = c.time_mode in ("all", "attn-only")

        def res(name, h, ch):
            if c.time_mode == "attn-only":
                return VAEResnetBlock(ch, groups=g, name=name)(h)
            return VideoVAEResBlock(
                ch, kernel=tuple(c.video_kernel_size), groups=g,
                merge_strategy=c.merge_strategy, alpha=c.alpha,
                name=name)(h, num_frames)

        h = z.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        ch = v.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(h)
        h = res("mid_block_1", h, ch)
        if attn_time:
            h = VideoAttnBlock(ch, groups=g,
                               merge_strategy=c.merge_strategy,
                               alpha=c.alpha, name="mid_attn")(h, num_frames)
        else:
            # spatial-only mid attention, same params as models/vae.py
            from neurons_tpu.models.vae import VAEAttnBlock
            h = VAEAttnBlock(ch, groups=g, name="mid_attn")(h)
        h = res("mid_block_2", h, ch)
        for i, ch in enumerate(reversed(v.block_out_channels)):
            for j in range(v.layers_per_block + 1):
                h = res(f"up_{i}_block_{j}", h, ch)
            if i != len(v.block_out_channels) - 1:
                h = Upsample(ch, name=f"up_{i}_upsample")(h)
        h = GroupNormSiLU(num_groups=g, epsilon=1e-6, name="norm_out")(h)
        if conv_time:
            h = AE3DConv(v.out_channels, kernel=tuple(c.video_kernel_size),
                         name="conv_out")(h, num_frames)
        else:
            h = nn.Conv(v.out_channels, (3, 3), padding=1,
                        name="conv_out")(h)
        return h.transpose(0, 3, 1, 2)  # -> NCHW
