"""AutoencoderKL — the SD first-stage VAE, flax/NHWC.

Re-design of the first-stage autoencoder the reference uses twice: HF
diffusers `AutoencoderKL` for blurry-video latents (reference
train_neurons.py:198-199,498-499) and sgm's legacy `AutoencoderKL` for
unCLIP decoding (reference generative_models/sgm/models/autoencoder.py:
437-521 + sgm/modules/diffusionmodules/model.py Encoder/Decoder; config
unclip6.yaml:98-113: ch 128, ch_mult [1,2,4,4], 2 res blocks, no attn at
intermediate resolutions, mid-block attention, double_z). Both reference
engines share this architecture, so one module serves both with different
imported weights.

TPU notes: all convs NHWC; the mid-block attention is a single-head
full-resolution attention over (H/8)^2 tokens (144 @ 96x96 latents) — XLA
path. GroupNorm(32)+SiLU chains around each conv are the HBM-bound hot
path; they fuse via ops/fused_norm (Pallas) on TPU.

Latent scaling: diffusers SD-1.5 uses 0.18215 (reference :499), the unclip
engine 0.13025 (unclip6.yaml:6); both live in config, not here.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import VAEConfig
from neurons_tpu.ops.attention import dot_product_attention
from neurons_tpu.ops.fused_norm import GroupNorm, GroupNormSiLU


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        residual = x
        h = GroupNormSiLU(num_groups=self.groups, epsilon=self.eps,
                          name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = GroupNormSiLU(num_groups=self.groups, epsilon=self.eps,
                          name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1),
                               name="nin_shortcut")(residual)
        return residual + h


class VAEAttnBlock(nn.Module):
    """Single-head full attention over spatial tokens (SD VAE mid block)."""

    channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        t = GroupNorm(num_groups=self.groups, epsilon=1e-6,
                      name="norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, name="q")(t)[:, None]  # [B, 1(head), T, C]
        k = nn.Dense(c, name="k")(t)[:, None]
        v = nn.Dense(c, name="v")(t)[:, None]
        out = dot_product_attention(q, k, v)[:, 0]
        out = nn.Dense(c, name="proj_out")(out).reshape(b, h, w, c)
        return residual + out


class Downsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        # SD VAE uses asymmetric padding (0,1,0,1) with stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=2, padding="VALID",
                       name="conv")(x)


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        g = min(c.norm_num_groups, c.block_out_channels[0])
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = VAEResnetBlock(ch, groups=g, name=f"down_{i}_block_{j}")(h)
            if i != len(c.block_out_channels) - 1:
                h = Downsample(ch, name=f"down_{i}_downsample")(h)
        ch = c.block_out_channels[-1]
        h = VAEResnetBlock(ch, groups=g, name="mid_block_1")(h)
        h = VAEAttnBlock(ch, groups=g, name="mid_attn")(h)
        h = VAEResnetBlock(ch, groups=g, name="mid_block_2")(h)
        h = GroupNormSiLU(num_groups=g, epsilon=1e-6, name="norm_out")(h)
        # double_z: moments (mean ++ logvar)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        g = min(c.norm_num_groups, c.block_out_channels[0])
        ch = c.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(z)
        h = VAEResnetBlock(ch, groups=g, name="mid_block_1")(h)
        h = VAEAttnBlock(ch, groups=g, name="mid_attn")(h)
        h = VAEResnetBlock(ch, groups=g, name="mid_block_2")(h)
        for i, ch in enumerate(reversed(c.block_out_channels)):
            for j in range(c.layers_per_block + 1):
                h = VAEResnetBlock(ch, groups=g, name=f"up_{i}_block_{j}")(h)
            if i != len(c.block_out_channels) - 1:
                h = Upsample(ch, name=f"up_{i}_upsample")(h)
        h = GroupNormSiLU(num_groups=g, epsilon=1e-6, name="norm_out")(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, name="conv_out")(h)


class DiagonalGaussian(NamedTuple):
    """Posterior q(z|x) — mean/logvar split of the encoder moments."""

    mean: jax.Array
    logvar: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(key, self.mean.shape,
                                                   self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean


class AutoencoderKL(nn.Module):
    """Full VAE. Public API mirrors the reference call sites:
      encode(x) -> DiagonalGaussian  (x NCHW in [-1, 1])
      decode(z) -> x NCHW
    NCHW at the boundary (the reference artifact contract), NHWC inside.
    """

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        moments = self.quant_conv(self.encoder(x))
        moments = moments.transpose(0, 3, 1, 2)  # -> NCHW
        mean, logvar = jnp.split(moments, 2, axis=1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z: jax.Array) -> jax.Array:
        z = z.transpose(0, 2, 3, 1)
        x = self.decoder(self.post_quant_conv(z))
        return x.transpose(0, 3, 1, 2)

    def __call__(self, x: jax.Array, key: jax.Array = None):
        posterior = self.encode(x)
        z = posterior.mode() if key is None else posterior.sample(key)
        return self.decode(z), posterior
