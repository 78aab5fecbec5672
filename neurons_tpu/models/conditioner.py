"""Conditioning: the generic embedder registry + the unCLIP instance.

`GeneralConditioner` is the full sgm registry (reference
sgm/modules/encoders/modules.py:71-185): a list of embedders, each
declaring its batch input keys, whose outputs are routed by RANK into
`vector` (2-d) / `crossattn` (3-d) / `concat` (4/5-d) slots and
concatenated along the slot's cat axis, with two unconditional-guidance
dropout flavors — multiplicative Bernoulli zeroing (`ucg_rate`) and
legacy per-example value substitution (`legacy_ucg_val`). The TPU-first
differences from torch: dropout takes an explicit PRNG key (pass
`key=None` at inference and the registry is deterministic — the
reference mutates `.ucg_rate` to 0 around eval instead), embedders are
plain callables + params pytrees (no nn.Module registry), and
`get_unconditional_conditioning` is a pure pair of calls.

The unclip6 engine uses exactly three embedders (unclip6.yaml:65-97):
  * FrozenOpenCLIPImageEmbedder (ViT-bigG tokens) -> crossattn [B, 256, 1664]
  * ConcatTimestepEmbedderND(256) on original_size  -> vector [B, 512]
  * ConcatTimestepEmbedderND(256) on crop_coords    -> vector [B, 512]
Vectors concatenate to the 1024-d `adm` input. In this framework the CLIP
tokens come either from the brain model / prior (the NEURONS path — no CLIP
forward needed at inference) or from the CLIP ViT (models/clip.py);
`unclip_vector_suffix` is the constant the reference computes once from a
placeholder batch (reference recon_keyframe_neurons.py:268-273,
jpg=randn, size=768, crop=0).
"""

from __future__ import annotations

import dataclasses

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from neurons_tpu.models.unet2d import timestep_embedding


@dataclasses.dataclass(frozen=True)
class Embedder:
    """One registry entry (reference AbstractEmbModel:27-68 + the config
    plumbing in GeneralConditioner.__init__:76-113).

    fn: `(*batch[k] for k in input_keys) -> array | sequence of arrays`
        (close over params; a flax `module.apply` partial is typical).
    ucg_rate: Bernoulli probability of zeroing each example's embedding
        (classifier-free-guidance dropout, modules.py:146-158).
    legacy_ucg_val: when set, dropout replaces the INPUT value instead
        of zeroing the output (modules.py:115-122).
    out_key: override the rank-based slot routing.
    """
    fn: Callable[..., Any]
    input_keys: Tuple[str, ...]
    ucg_rate: float = 0.0
    legacy_ucg_val: Optional[Any] = None
    out_key: Optional[str] = None


class GeneralConditioner:
    """Rank-routing embedder registry (modules.py:71-185)."""

    OUTPUT_DIM2KEYS = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}
    KEY2CATDIM = {"vector": 1, "crossattn": 2, "concat": 1}

    def __init__(self, embedders: Sequence[Embedder]):
        self.embedders = tuple(embedders)

    def __call__(self, batch: Dict[str, jax.Array],
                 key: Optional[jax.Array] = None,
                 force_zero_embeddings: Sequence[str] = ()
                 ) -> Dict[str, jax.Array]:
        """key=None disables ucg dropout (inference); with a key, each
        embedder folds its index in, so one key drives the whole
        registry deterministically."""
        out: Dict[str, jax.Array] = {}
        for i, e in enumerate(self.embedders):
            vals = [batch[k] for k in e.input_keys]
            if (e.legacy_ucg_val is not None and e.ucg_rate > 0.0
                    and key is not None):
                # legacy flavor: substitute the input value per example
                k_i = jax.random.fold_in(key, i)
                v0 = vals[0]
                drop = jax.random.bernoulli(k_i, e.ucg_rate,
                                            (v0.shape[0],))
                sub = jnp.broadcast_to(jnp.asarray(e.legacy_ucg_val,
                                                   v0.dtype), v0.shape)
                vals[0] = jnp.where(
                    drop.reshape((-1,) + (1,) * (v0.ndim - 1)), sub, v0)
            emb_out = e.fn(*vals)
            if not isinstance(emb_out, (list, tuple)):
                emb_out = [emb_out]
            for emb in emb_out:
                out_key = e.out_key or self.OUTPUT_DIM2KEYS[emb.ndim]
                if (e.ucg_rate > 0.0 and e.legacy_ucg_val is None
                        and key is not None):
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(key, i), 1.0 - e.ucg_rate,
                        (emb.shape[0],)).astype(emb.dtype)
                    emb = emb * keep.reshape((-1,) + (1,) * (emb.ndim - 1))
                if e.input_keys and e.input_keys[0] in force_zero_embeddings:
                    emb = jnp.zeros_like(emb)
                if out_key in out:
                    out[out_key] = jnp.concatenate(
                        [out[out_key], emb], axis=self.KEY2CATDIM[out_key])
                else:
                    out[out_key] = emb
        return out

    def get_unconditional_conditioning(
        self, batch_c: Dict[str, jax.Array],
        batch_uc: Optional[Dict[str, jax.Array]] = None,
        force_uc_zero_embeddings: Sequence[str] = (),
        force_cond_zero_embeddings: Sequence[str] = (),
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """The CFG pair (modules.py:167-185). Dropout is simply not
        applied (no key) — the reference achieves the same by zeroing
        every ucg_rate around the two forwards."""
        c = self(batch_c, key=None,
                 force_zero_embeddings=force_cond_zero_embeddings)
        uc = self(batch_c if batch_uc is None else batch_uc, key=None,
                  force_zero_embeddings=force_uc_zero_embeddings)
        return c, uc


def unclip_conditioner(clip_image_fn: Callable[[jax.Array], jax.Array],
                       outdim: int = 256) -> GeneralConditioner:
    """The unclip6 engine's registry instance (unclip6.yaml:65-97):
    image tokens -> crossattn, two ConcatTimestepEmbedderND -> vector."""
    return GeneralConditioner([
        Embedder(clip_image_fn, ("jpg",), ucg_rate=0.1),
        Embedder(lambda v: concat_timestep_embedder(v, outdim),
                 ("original_size_as_tuple",)),
        Embedder(lambda v: concat_timestep_embedder(v, outdim),
                 ("crop_coords_top_left",)),
    ])


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
