"""Brain-decoding models: voxel -> CLIP-bigG image-token embeddings.

Flax re-design of the reference's trainable core
(reference model_variants/BrainModel_neurons.py):

  RidgeRegression      — per-subject voxel adapter        (reference :212-223)
  BrainBackbone        — MLP-Mixer + token-grid projector (reference :227-305)
  CLIPProj             — pooled 1664 -> 1280 text-space   (reference :192-201)
  MotionProj           — static -> per-frame embeddings   (reference :116-143)
  MultiLabelClassifier — 51-way concept classifier        (reference :13-24)

TPU notes: the heavy op is `backbone_linear` (4096 -> 256*1664 = 425,984),
a single large matmul that XLA tiles straight onto the MXU; the mixer blocks
are fused elementwise+matmul chains. All modules are shape-static and carry
no Python control flow, so the whole voxel->CLIP forward jits to one XLA
computation. For tensor parallelism the wide output linear can be sharded
over the `model` mesh axis via param sharding rules (see parallel/mesh.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import BrainModelConfig


class RidgeRegression(nn.Module):
    """Per-subject voxel->hidden linear adapter (reference :212-223).

    One Dense per subject; `subj_idx` must be static (a run trains a single
    subject, matching the reference's `subj_list=[args.subj]`,
    train_neurons.py:70).
    """

    input_sizes: Sequence[int]
    out_features: int = 4096
    seq_len: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, subj_idx: int = 0) -> jax.Array:
        # x: [B, seq_len, n_voxels] -> [B, seq_len, out_features]
        layers = [nn.Dense(self.out_features, name=f"subj{i}")
                  for i in range(len(self.input_sizes))]
        outs = [layers[subj_idx](x[:, s])[:, None] for s in range(self.seq_len)]
        return jnp.concatenate(outs, axis=1)


class _MixerMLP(nn.Module):
    dim: int
    drop: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        x = nn.Dense(self.dim)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return nn.Dense(self.dim)(x)


class _Projector(nn.Module):
    """4-layer LayerNorm/GELU/Dense token projector (reference :247-258)."""

    out_dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm()(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden)(x)
        x = nn.LayerNorm()(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden)(x)
        x = nn.LayerNorm()(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim)(x)


class BrainBackbone(nn.Module):
    """MLP-Mixer over (seq, hidden) + projection to the CLIP token grid
    (reference :227-305). Returns (voxels_embed, clip_vision_embed), both
    [B, clip_seq_dim, clip_emb_dim]."""

    cfg: BrainModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        c = self.cfg
        # x: [B, seq_len, h]
        residual1 = x
        residual2 = jnp.swapaxes(x, 1, 2)
        for i in range(c.n_blocks):
            h = nn.LayerNorm(name=f"mix1_ln_{i}")(x)
            h = _MixerMLP(c.hidden_dim, c.dropout, name=f"mix1_mlp_{i}")(
                h, deterministic)
            x = h + residual1
            residual1 = x
            x = jnp.swapaxes(x, 1, 2)

            h = nn.LayerNorm(name=f"mix2_ln_{i}")(x)
            h = _MixerMLP(c.seq_len, c.dropout, name=f"mix2_mlp_{i}")(
                h, deterministic)
            x = h + residual2
            residual2 = x
            x = jnp.swapaxes(x, 1, 2)

        x = x.reshape(x.shape[0], -1)  # [B, seq_len * h]
        voxels_embed = nn.Dense(c.out_dim, name="backbone_linear")(x)
        voxels_embed = voxels_embed.reshape(-1, c.clip_seq_dim, c.clip_emb_dim)
        clip_vision_embed = _Projector(c.clip_emb_dim, c.clip_emb_dim,
                                       name="clip_proj")(voxels_embed)
        return voxels_embed, clip_vision_embed


class CLIPProj(nn.Module):
    """Mean-pool tokens then project 1664 -> 1280 CLIP-text space
    (reference :192-201). Weights are preloaded from the coco-tokens average
    projection and frozen (reference train_neurons.py:240-241,257)."""

    in_dim: int = 1664
    out_dim: int = 1280

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        proj = self.param("proj", nn.initializers.normal(1.0),
                          (self.in_dim, self.out_dim))
        return jnp.mean(x, axis=1) @ proj


class MotionProj(nn.Module):
    """Lift a static 256-token embedding to per-frame embeddings
    (reference :116-143): Dense(c -> c*F), split last dim channel-major into
    (c, F), route tokens through a sqrt(N) x sqrt(N) spatial grid, and emit
    [B, F, N, C]."""

    n_frames: int = 6
    clip_size: int = 1664

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        m = nn.Dense(self.clip_size * self.n_frames, name="motion_proj")(x)
        # 'b n (c f) -> b c f n' (einops split is channel-major)
        m = m.reshape(b, n, c, self.n_frames)
        m = jnp.transpose(m, (0, 2, 3, 1))       # [B, C, F, N]
        # 'b c f (h w) -> b f (h w) c'
        return jnp.transpose(m, (0, 2, 3, 1))    # [B, F, N, C]


class MultiLabelClassifier(nn.Module):
    """51-way multi-label concept classifier on the pooled motion embedding
    (reference :13-24)."""

    in_channel_text: int = 1280
    class_num: int = 51

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.in_channel_text, name="vision_proj_channel")(x)
        return nn.Dense(self.class_num, name="classifier")(x)
