"""Classifier ViTs for the stage-6 semantic metrics.

Re-designs the HF classifiers the reference loads for evaluation:
  google/vit-base-patch16-224 (ImageNet-1k, frame 2/50-way metric,
    reference eval_metrics.py:72-105)
  MCG-NJU/videomae-base-finetuned-kinetics (Kinetics-400, video metric,
    reference :107-142)

Both are standard pre-norm ViT encoders; VideoMAE patchifies 3-D tubelets
(2 frames x 16 x 16) and mean-pools tokens. HF checkpoints import via
interop/torch_import.py; tests use tiny configs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.ops.attention import dot_product_attention


class ViTConfig(NamedTuple):
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    num_classes: int = 1000
    tubelet_size: int = 1   # >1 -> VideoMAE-style 3-D patches
    mlp_ratio: float = 4.0
    num_frames: int = 1
    pool: str = "cls"       # cls | mean

    @staticmethod
    def vit_base_224() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def videomae_kinetics(num_frames: int = 16) -> "ViTConfig":
        return ViTConfig(num_classes=400, tubelet_size=2,
                         num_frames=num_frames, pool="mean")

    @staticmethod
    def tiny(num_classes: int = 10) -> "ViTConfig":
        return ViTConfig(image_size=32, patch_size=8, width=32, layers=2,
                         heads=4, num_classes=num_classes)


class _EncoderBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h = nn.LayerNorm(epsilon=1e-12, name="ln_1")(x)
        q = nn.Dense(d, name="q")(h)
        k = nn.Dense(d, name="k")(h)
        v = nn.Dense(d, name="v")(h)
        hd = d // self.heads

        def split(y):
            return y.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, name="attn_out")(out)
        h = nn.LayerNorm(epsilon=1e-12, name="ln_2")(x)
        h = nn.gelu(nn.Dense(int(self.mlp_ratio * d), name="mlp_fc")(h),
                    approximate=False)
        return x + nn.Dense(d, name="mlp_proj")(h)


class ViTClassifier(nn.Module):
    """Images [B, 3, H, W] (or videos [B, F, 3, H, W] when tubelet_size>1,
    ImageNet-normalized) -> logits [B, num_classes]."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        if c.tubelet_size > 1:
            # VideoMAE: [B, F, 3, H, W] -> tubelet tokens
            b, f, ch, hh, ww = x.shape
            ts = c.tubelet_size
            x = x.reshape(b, f // ts, ts, ch, hh, ww)
            # [B, F/ts, H/p, W/p, ts*p*p*ch] patch extraction via reshape
            p = c.patch_size
            x = x.reshape(b, f // ts, ts, ch, hh // p, p, ww // p, p)
            x = x.transpose(0, 1, 4, 6, 2, 5, 7, 3)
            x = x.reshape(b, (f // ts) * (hh // p) * (ww // p),
                          ts * p * p * ch)
            x = nn.Dense(c.width, name="patch_embed")(x)
            tokens = x
        else:
            x = x.transpose(0, 2, 3, 1)
            x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                        strides=c.patch_size, name="patch_embed")(x)
            b, gh, gw, d = x.shape
            tokens = x.reshape(b, gh * gw, d)

        if c.pool == "cls":
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, c.width))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (tokens.shape[0], 1, c.width)),
                 tokens], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (tokens.shape[1], c.width))
        tokens = tokens + pos[None]
        for i in range(c.layers):
            tokens = _EncoderBlock(c.width, c.heads, c.mlp_ratio,
                                   name=f"block_{i}")(tokens)
        if c.pool == "cls":
            # HF ViTForImageClassification: LN over the sequence, take CLS
            pooled = nn.LayerNorm(epsilon=1e-12, name="ln_post")(tokens)[:, 0]
        else:
            # HF VideoMAE use_mean_pooling: mean-pool FIRST, then fc_norm
            pooled = nn.LayerNorm(epsilon=1e-12, name="ln_post")(tokens.mean(axis=1))
        return nn.Dense(c.num_classes, name="head")(pooled)
