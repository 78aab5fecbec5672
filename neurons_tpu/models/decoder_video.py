"""Text-driven decoupler decoder: seg / blurry-recon heads with a
temporal-attention VAE-style upsampling decoder.

Flax re-design of the reference's decoupler decoder
(reference model_variants/BrainModel_neurons.py:28-112 `TextDrivenDecoder`
and model_variants/video_decoder.py `DecoderVideo`/`UNetMidBlock2D`/
`AttnUpDecoderBlock2D`):

  TextDrivenDecoder — text<->vision cross attention (q from vision tokens,
    k/v from pooled text embeddings), 1x1-conv maps projector 1280->64,
    DecoderVideo upsampler 16x16 -> 64x64, then seg (32->1) or recon
    (32->4 VAE-latent) conv heads.

  DecoderVideo — conv_in -> mid block -> 3 attention up-blocks -> GN+SiLU.
    Every attention site runs spatial attention then reshapes
    `(b t) c h w -> (b h w) t c` for temporal attention over frames, blending
    with a learned scalar: w * spatial + (1 - w) * temporal
    (reference video_decoder.py:237-248,394-406).

Faithfully reproduced quirk: the reference's text cross-attention keys are
the *batch* of pooled text embeddings (text_feat is [B, 1280]), so each
vision token attends across all B texts in the batch
(reference BrainModel_neurons.py:67-82 with 2-D text input). Documented and
kept — checkpoint parity and training dynamics depend on it.

TPU design: all convs/norms run in NHWC (the TPU-native conv layout); the
public API accepts NCHW to honor the reference artifact contract and
transposes at the boundary. The temporal attention is a large batch
(b*h*w) of short rows — it maps to the XLA attention path, and the frame
axis can be GSPMD-sharded (`frame` mesh axis) for long clips.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.ops.attention import dot_product_attention
from neurons_tpu.ops.fused_norm import GroupNorm, GroupNormSiLU


class ResnetBlock2D(nn.Module):
    """diffusers-style ResnetBlock2D (no time embedding in this decoder):
    GN -> SiLU -> conv3x3 -> GN -> SiLU -> dropout -> conv3x3, residual with
    1x1 shortcut when channels change. NHWC."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        h = GroupNormSiLU(num_groups=self.groups, epsilon=self.eps,
                          name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = GroupNormSiLU(num_groups=self.groups, epsilon=self.eps,
                          name="norm2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1),
                               name="conv_shortcut")(residual)
        return residual + h


class AttnBlock(nn.Module):
    """diffusers deprecated-style attention block: GN, then q/k/v linear
    attention over flattened tokens, residual. `heads` from
    channels // head_dim (the decoder uses head_dim = channels -> 1 head).
    Operates on a token axis directly: input [..., T, C]."""

    channels: int
    head_dim: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, tokens):
        hd = self.head_dim or self.channels
        heads = max(1, self.channels // hd)
        residual = tokens
        h = GroupNorm(num_groups=self.groups, epsilon=self.eps,
                      name="group_norm")(tokens)
        q = nn.Dense(self.channels, name="to_q")(h)
        k = nn.Dense(self.channels, name="to_k")(h)
        v = nn.Dense(self.channels, name="to_v")(h)
        b, t, _ = q.shape
        dh = self.channels // heads

        def split(x):
            return x.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)

        # Dispatcher (flash on TPU at >=128 tokens): XLA attention is
        # actually FASTER at the dominant training shape [60,1,4096,32]
        # (fwd 12.5 vs 16.5 ms, fwd+bwd 29.4 vs 46.5 ms, A/B'd on v5e)
        # but its backward materializes the [60,4096,4096] logits — the
        # full stage-2 step then needs 16.66 G of 15.75 G HBM (measured
        # OOM via tools/train_bench.py). The q-chunked flash backward is
        # what makes batch-10 stage 2 fit a single v5e chip; keep it.
        out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        out = nn.Dense(self.channels, name="to_out")(out)
        return out + residual


class Upsample2D(nn.Module):
    """Nearest 2x upsample + conv3x3 (diffusers Upsample2D use_conv)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv")(x)


class _SpatialTemporalAttn(nn.Module):
    """One spatial-attention + temporal-attention blend site
    (reference video_decoder.py:239-248). Input [(b t), H, W, C]."""

    channels: int
    groups: int

    @nn.compact
    def __call__(self, x, time: int):
        bt, hh, ww, c = x.shape
        b = bt // time
        tokens = x.reshape(bt, hh * ww, c)
        spatial = AttnBlock(self.channels, groups=self.groups,
                            name="attn")(tokens).reshape(bt, hh, ww, c)
        # (b t) h w c -> (b h w) t c
        tmp = spatial.reshape(b, time, hh, ww, c).transpose(0, 2, 3, 1, 4)
        tmp = tmp.reshape(b * hh * ww, time, c)
        tmp = AttnBlock(self.channels, groups=self.groups,
                        name="temp_attn")(tmp)
        tmp = tmp.reshape(b, hh, ww, time, c).transpose(0, 3, 1, 2, 4)
        tmp = tmp.reshape(bt, hh, ww, c)
        w = self.param("blend_weight", nn.initializers.ones, (1,))
        return w * spatial + (1 - w) * tmp


class MidBlockVideo(nn.Module):
    """reference video_decoder.py:394-408: resnet, then per layer
    [spatial attn -> temporal attn blend -> resnet]."""

    channels: int
    num_layers: int = 1
    groups: int = 32

    @nn.compact
    def __call__(self, x, time: int, deterministic: bool = True):
        x = ResnetBlock2D(self.channels, groups=self.groups,
                          name="resnet_0")(x, deterministic)
        for i in range(self.num_layers):
            x = _SpatialTemporalAttn(self.channels, self.groups,
                                     name=f"st_attn_{i}")(x, time)
            x = ResnetBlock2D(self.channels, groups=self.groups,
                              name=f"resnet_{i + 1}")(x, deterministic)
        return x


class AttnUpBlockVideo(nn.Module):
    """reference video_decoder.py:233-255: per layer [resnet -> spatial attn
    -> temporal attn blend], then optional 2x upsample."""

    out_channels: int
    num_layers: int
    add_upsample: bool
    groups: int = 32

    @nn.compact
    def __call__(self, x, time: int, deterministic: bool = True):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, groups=self.groups,
                              name=f"resnet_{i}")(x, deterministic)
            x = _SpatialTemporalAttn(self.out_channels, self.groups,
                                     name=f"st_attn_{i}")(x, time)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsample")(x)
        return x


class DecoderVideo(nn.Module):
    """reference video_decoder.py:412-563 (NHWC). Input [(b t), H, W, Cin],
    output [(b t), H*2^(n-1), W*2^(n-1), block_out_channels[0]]."""

    block_out_channels: Sequence[int] = (32, 64, 128)
    layers_per_block: int = 1
    norm_num_groups: int = 32

    @nn.compact
    def __call__(self, x, time: int = 1, deterministic: bool = True):
        ch = list(self.block_out_channels)
        x = nn.Conv(ch[-1], (3, 3), padding=1, name="conv_in")(x)
        x = MidBlockVideo(ch[-1], groups=self.norm_num_groups,
                          name="mid_block")(x, time, deterministic)
        rev = list(reversed(ch))
        for i, out_c in enumerate(rev):
            is_final = i == len(ch) - 1
            x = AttnUpBlockVideo(out_c, self.layers_per_block + 1,
                                 add_upsample=not is_final,
                                 groups=self.norm_num_groups,
                                 name=f"up_block_{i}")(x, time, deterministic)
        return GroupNormSiLU(num_groups=self.norm_num_groups, epsilon=1e-6,
                            name="conv_norm_out")(x)


class TextDrivenDecoder(nn.Module):
    """reference BrainModel_neurons.py:28-112. `vision_feat` [B', N, Cv]
    (B' = batch*frames), `text_feat` [B, Ct] pooled text embeddings or None.
    Returns NCHW maps to honor the reference artifact contract:
      is_seg=True  -> [B', 1, H, W] segmentation logits
      is_seg=False -> [B', 4, H, W] VAE-latent prediction
    """

    clip_vision_emb_dim: int = 1664
    clip_txt_emb_dim: int = 1280
    decoder_block_out_channels: Tuple[int, ...] = (32, 64, 128)
    decoder_layers_per_block: int = 1
    attention_dropout: float = 0.1
    dropout: float = 0.3

    @nn.compact
    def __call__(self, vision_feat, text_feat=None, time: int = 1,
                 is_seg: bool = True, return_all: bool = False,
                 deterministic: bool = True):
        ct = self.clip_txt_emb_dim
        q = nn.Dense(ct, use_bias=False, name="q")(vision_feat)
        if text_feat is not None:
            k = nn.Dense(ct, use_bias=False, name="k")(text_feat)  # [B, Ct]
            v = nn.Dense(ct, use_bias=False, name="v")(text_feat)
            # reference quirk: keys/values are the batch of texts; each
            # vision token attends over all B texts (scale uses the VISION
            # dim and multiplies after the matmul, reference :73-75)
            scale = self.clip_vision_emb_dim ** -0.5
            attn = jnp.einsum("bnc,tc->bnt", q, k) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attention_dropout,
                              deterministic=deterministic)(attn)
            out = jnp.einsum("bnt,tc->bnc", attn, v)
            out = nn.Dense(ct, use_bias=False, name="out")(out)
        else:
            out = nn.Dense(ct, use_bias=False, name="out")(q)
        x = nn.Dropout(self.attention_dropout,
                       deterministic=deterministic)(out)

        bb, n, c = x.shape
        hw = int(math.sqrt(n))
        x = x.reshape(bb, hw, hw, c)  # NHWC token grid

        # maps_projector: 1x1 convs 1280 -> 512 -> 128 -> 64 with GN(1)+ReLU
        x = nn.Conv(512, (1, 1), use_bias=False, name="maps_0")(x)
        x = GroupNorm(num_groups=1, epsilon=1e-5, name="maps_gn_0")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (1, 1), use_bias=False, name="maps_1")(x)
        x = GroupNorm(num_groups=1, epsilon=1e-5, name="maps_gn_1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (1, 1), use_bias=True, name="maps_2")(x)

        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(x)

        groups = min(32, min(self.decoder_block_out_channels))
        x = DecoderVideo(self.decoder_block_out_channels,
                         self.decoder_layers_per_block,
                         norm_num_groups=groups,
                         name="video_decoder")(x, time, deterministic)

        def to_nchw(y):
            return y.transpose(0, 3, 1, 2)

        # both heads are always declared (flax params must not depend on the
        # branch taken at init); each is a cheap 3x3 conv
        seg = to_nchw(nn.Conv(1, (3, 3), padding=1, name="seg_head")(x))
        rec = to_nchw(nn.Conv(4, (3, 3), padding=1, name="recon_head")(x))
        if return_all:
            return seg, rec
        return seg if is_seg else rec
