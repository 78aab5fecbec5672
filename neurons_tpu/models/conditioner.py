"""unCLIP conditioning (sgm GeneralConditioner equivalent).

The reference routes embedder outputs by rank into `vector` / `crossattn` /
`concat` slots (reference sgm/modules/encoders/modules.py:71-164). The
unclip6 engine uses exactly three embedders (unclip6.yaml:65-97):
  * FrozenOpenCLIPImageEmbedder (ViT-bigG tokens) -> crossattn [B, 256, 1664]
  * ConcatTimestepEmbedderND(256) on original_size  -> vector [B, 512]
  * ConcatTimestepEmbedderND(256) on crop_coords    -> vector [B, 512]
Vectors concatenate to the 1024-d `adm` input. In this framework the CLIP
tokens come either from the brain model / prior (the NEURONS path — no CLIP
forward needed at inference) or from the CLIP ViT (models/clip.py); this
module provides the timestep-embedder vector math, which the reference
computes once from a placeholder batch (reference
recon_keyframe_neurons.py:268-273, jpg=randn, size=768, crop=0).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from neurons_tpu.models.unet2d import timestep_embedding


def concat_timestep_embedder(values: jax.Array, outdim: int = 256
                             ) -> jax.Array:
    """ConcatTimestepEmbedderND (reference sgm/modules/encoders/modules.py):
    embed each scalar with the OpenAI timestep embedding and concatenate.
    values: [B, N] -> [B, N * outdim]."""
    b, n = values.shape
    emb = timestep_embedding(values.reshape(-1), outdim)
    return emb.reshape(b, n * outdim)


def unclip_vector_suffix(batch_size: int = 1,
                         orig_size: Sequence[int] = (768, 768),
                         crop_coords: Sequence[int] = (0, 0),
                         outdim: int = 256) -> jax.Array:
    """The constant `vector` conditioning the reference builds from a
    placeholder batch (reference recon_keyframe_neurons.py:268-273,329-334):
    cat(embed(orig_size), embed(crop)) -> [B, 1024]."""
    size = jnp.tile(jnp.asarray([orig_size], jnp.float32), (batch_size, 1))
    crop = jnp.tile(jnp.asarray([crop_coords], jnp.float32), (batch_size, 1))
    return jnp.concatenate([concat_timestep_embedder(size, outdim),
                            concat_timestep_embedder(crop, outdim)], axis=-1)
