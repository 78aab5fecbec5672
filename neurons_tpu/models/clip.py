"""CLIP towers (image ViT + causal text transformer), flax.

Re-designs the frozen encoders the reference uses via open_clip / HF:
  FrozenOpenCLIPImageEmbedder ViT-bigG-14 `only_tokens` -> [B, 256, 1664]
    (reference sgm/modules/encoders/modules.py:624-688)
  FrozenOpenCLIPEmbedder2 text tower, `last` + pooled 1280-d
    (reference :396-499)
  CLIP ViT-L/14 image features for CLIP-pcc (reference eval_metrics.py:294)
  CLIP ViT-B/32 image features for clip_score (reference :20-55)

One configurable tower covers all variants; weights import from open_clip /
HF checkpoints (interop/torch_import.py). Tests run tiny configs.

TPU notes: patchify = conv stride patch (MXU); attention via
ops.attention (Pallas flash on TPU — 257 tokens x 48 layers for bigG);
inputs bf16, LayerNorms fp32 accumulations via XLA defaults.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.ops.attention import dot_product_attention, xla_attention

# OpenAI CLIP normalization (reference modules.py:633-645)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPVisionConfig(NamedTuple):
    image_size: int = 224
    patch_size: int = 14
    width: int = 1664
    layers: int = 48
    heads: int = 16
    mlp_ratio: float = 4.9231  # bigG
    output_dim: int = 1280
    quick_gelu: bool = False  # OpenAI towers (L/14, B/32) use QuickGELU

    @staticmethod
    def bigG() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def vit_l14() -> "CLIPVisionConfig":
        return CLIPVisionConfig(patch_size=14, width=1024, layers=24,
                                heads=16, mlp_ratio=4.0, output_dim=768,
                                quick_gelu=True)

    @staticmethod
    def vit_b32() -> "CLIPVisionConfig":
        return CLIPVisionConfig(patch_size=32, width=768, layers=12,
                                heads=12, mlp_ratio=4.0, output_dim=512,
                                quick_gelu=True)

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=32, patch_size=8, width=32,
                                layers=2, heads=4, mlp_ratio=4.0,
                                output_dim=24)


class CLIPTextConfig(NamedTuple):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1280
    layers: int = 32
    heads: int = 20
    output_dim: int = 1280
    quick_gelu: bool = False

    @staticmethod
    def bigG() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        """SD-1.5's text encoder (openai CLIP ViT-L/14: QuickGELU)."""
        return CLIPTextConfig(width=768, layers=12, heads=12,
                              output_dim=768, quick_gelu=True)

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=128, context_length=16, width=32,
                              layers=2, heads=4, output_dim=24)


class _Block(nn.Module):
    width: int
    heads: int
    mlp_ratio: float
    causal: bool = False
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, d = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.heads

        def split(y):
            return y.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        attn_mask = None
        if self.causal:
            attn_mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        if attn_mask is not None or mask is not None:
            m = attn_mask if mask is None else \
                (mask if attn_mask is None else attn_mask & mask)
            out = xla_attention(split(q), split(k), split(v), mask=m)
        else:
            out = dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, name="out_proj")(out)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), name="mlp_fc")(h)
        # OpenAI CLIP towers use QuickGELU; open_clip bigG uses exact GELU
        h = h * jax.nn.sigmoid(1.702 * h) if self.quick_gelu else nn.gelu(
            h, approximate=False)
        return x + nn.Dense(d, name="mlp_proj")(h)


class CLIPVisionTower(nn.Module):
    """open_clip VisionTransformer. `__call__` returns (pooled_projected,
    tokens) — tokens are post-ln_post, pre-projection patch tokens, the
    reference's `only_tokens` output (modules.py:624-688)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """images [B, 3, H, W], already resized + CLIP-normalized."""
        c = self.cfg
        x = images.transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=c.patch_size, use_bias=False,
                    name="patch_embed")(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (d,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (1 + gh * gw, d))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(c.layers):
            x = _Block(c.width, c.heads, c.mlp_ratio,
                       quick_gelu=c.quick_gelu, name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        proj = self.param("proj", nn.initializers.normal(d ** -0.5),
                          (d, c.output_dim))
        return pooled @ proj, tokens

    def tokens(self, images):
        return self(images)[1]

    def features(self, images):
        return self(images)[0]


class CLIPTextTower(nn.Module):
    """open_clip text transformer: causal, pooled at argmax (EOT) token
    @ text_projection. Returns (last_hidden, pooled) matching the
    reference's FrozenOpenCLIPEmbedder2 layer='last' + pooled."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        c = self.cfg
        b, t = tokens.shape
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.width))
        x = jnp.take(jnp.asarray(emb), tokens, axis=0)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (c.context_length, c.width))
        x = x + pos[:t][None]
        for i in range(c.layers):
            x = _Block(c.width, c.heads, 4.0, causal=True,
                       quick_gelu=c.quick_gelu, name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param("text_projection",
                          nn.initializers.normal(c.width ** -0.5),
                          (c.width, c.output_dim))
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        pooled = x[jnp.arange(b), eot] @ proj
        return x, pooled


def preprocess_images(images: jax.Array, size: int = 224) -> jax.Array:
    """Bicubic resize + CLIP normalize (reference modules.py:633-645).
    images [B, 3, H, W] in [0, 1] (the sgm embedder maps [-1,1]->[0,1]
    internally; callers here pass [0,1] directly)."""
    b, ch, h, w = images.shape
    x = jax.image.resize(images, (b, ch, size, size), "bicubic")
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
    return (x - mean) / std
