"""Stage-e: decoupler-output evaluation (reference gen_decoupled_outputs.py).

Scores the decoupler heads in isolation on the test set: key-object
segmentation Dice vs GT masks (reference :484-488), per-class
classification accuracy/precision/recall (reference :449-479), caption
token accuracy, and emits the predicted seg masks / class ids / captions /
blurry latents — the component-level integration test of the ensemble.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurons_tpu.diffusion import prior as prior_lib
from neurons_tpu.training.losses import dice_loss, l2norm


class DecoupledOutputs(NamedTuple):
    seg_masks: jax.Array       # [(B F), 1, h, w] logits
    cls_logits: jax.Array      # [B, n_classes]
    captions: jax.Array        # [B, max_len]
    blurry_latents: jax.Array  # [(B F), 4, h, w]
    dice: Optional[jax.Array] = None
    cls_accuracy: Optional[jax.Array] = None
    cls_precision: Optional[jax.Array] = None
    cls_recall: Optional[jax.Array] = None


def generate_decoupled_outputs(
    *, decoupler_apply: Callable, decoupler_params, key: jax.Array,
    voxel: jax.Array, class_text_embeds: jax.Array, n_frames: int,
    prior_steps: int = 100, caption_len: int = 60,
    gt_masks: Optional[jax.Array] = None,
    gt_cls: Optional[jax.Array] = None,
) -> DecoupledOutputs:
    """Runs encode -> prior -> motion -> heads; if GT masks/classes are
    given, also scores Dice and multi-label accuracy (threshold 0.5,
    reference :449-488)."""
    from neurons_tpu.models.neurons import NeuronsDecoupler as ND

    b = voxel.shape[0]
    _, clip_vision, _ = decoupler_apply(decoupler_params, ND.encode, voxel)

    diffusion = prior_lib.PriorDiffusion.create(prior_steps)

    def net_apply(p, image_embed, times, brain_embed, **kw):
        return decoupler_apply(p, ND.prior_apply, image_embed, times,
                               brain_embed, **kw)

    prior_out = prior_lib.p_sample_loop(diffusion, net_apply,
                                        decoupler_params, key,
                                        clip_vision.shape, clip_vision)
    motion = decoupler_apply(decoupler_params, ND.motion, prior_out)
    pooled_text = decoupler_apply(decoupler_params, ND.project_text,
                                  motion.mean(axis=1))
    cls_logits = decoupler_apply(decoupler_params, ND.classify,
                                 motion.mean(axis=1).mean(axis=1))
    best = jnp.argmax(cls_logits, axis=-1)
    best_text = class_text_embeds[best]

    flat = motion.reshape(b * n_frames, motion.shape[2], motion.shape[3])
    seg, rec = decoupler_apply(decoupler_params, ND.seg_decode, flat,
                               best_text, b * n_frames, return_all=True)
    captions = decoupler_apply(decoupler_params, ND.caption_greedy,
                               l2norm(pooled_text), caption_len)

    dice = acc = prec = recall = None
    if gt_masks is not None:
        hw = seg.shape[-2:]
        gm = jax.image.resize(gt_masks, gt_masks.shape[:2] + hw, "nearest")
        gm = gm.reshape(b * n_frames, 1, *hw)
        dice = 1.0 - dice_loss(seg.astype(jnp.float32),
                               gm.astype(jnp.float32))
    if gt_cls is not None:
        pred = (jax.nn.sigmoid(cls_logits) > 0.5).astype(jnp.float32)
        gt = gt_cls.astype(jnp.float32)
        tp = (pred * gt).sum()
        acc = (pred == gt).mean()
        prec = tp / jnp.maximum(pred.sum(), 1.0)
        recall = tp / jnp.maximum(gt.sum(), 1.0)

    return DecoupledOutputs(seg_masks=seg, cls_logits=cls_logits,
                            captions=captions, blurry_latents=rec,
                            dice=dice, cls_accuracy=acc,
                            cls_precision=prec, cls_recall=recall)
