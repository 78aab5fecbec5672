"""Loss library — pure-functional JAX port of the reference loss semantics.

Covers the full surface of reference utils.py: BiMixCo voxel mixup
(utils.py:163-175), bidirectional InfoNCE with mixup targets
(utils.py:185-203), SoftCLIP (utils.py:127-134), Dice (utils.py:229-245),
temporal consistency (utils.py:207-226), retrieval metrics
(utils.py:83-110), cosine-anneal temperature (utils.py:258-259). All
functions are jit-safe (static shapes, no data-dependent Python control
flow) and take explicit PRNG keys instead of mutating global RNG state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp


class MixcoState(NamedTuple):
    """Mixup bookkeeping produced by `mixco`, consumed by `mixco_nce`."""

    perm: jax.Array    # [B] int32 permutation
    betas: jax.Array   # [B] mixing coefficients (1 where not mixed)
    select: jax.Array  # [B] bool, which rows were mixed


def mixco(key: jax.Array, voxels: jax.Array, beta: float = 0.15,
          s_thresh: float = 0.5) -> Tuple[jax.Array, MixcoState]:
    """BiMixCo voxel mixup (reference utils.py:163-175).

    Mixes each selected row with a random partner row:
      v_i <- beta_i * v_i + (1 - beta_i) * v_perm(i)
    Unselected rows keep beta_i = 1.
    """
    b = voxels.shape[0]
    k_perm, k_beta, k_sel = jax.random.split(key, 3)
    perm = jax.random.permutation(k_perm, b)
    betas = jax.random.beta(k_beta, beta, beta, shape=(b,)).astype(voxels.dtype)
    select = jax.random.uniform(k_sel, (b,)) <= s_thresh

    betas_eff = jnp.where(select, betas, 1.0).astype(voxels.dtype)
    bshape = (b,) + (1,) * (voxels.ndim - 1)
    mixed = voxels * betas_eff.reshape(bshape) + voxels[perm] * (1 - betas_eff).reshape(bshape)
    return mixed, MixcoState(perm=perm, betas=betas_eff, select=select)


def _mix_probs(state: MixcoState) -> jax.Array:
    """Soft target matrix for mixup InfoNCE (reference utils.py:190-191).

    probs[i, i] = beta_i, probs[i, perm[i]] = 1 - beta_i. Note when
    perm[i] == i the reference's scatter overwrites the diagonal with
    1 - beta_i; we reproduce that with an explicit scatter after setting
    the diagonal.
    """
    b = state.betas.shape[0]
    probs = jnp.diag(state.betas)
    probs = probs.at[jnp.arange(b), state.perm].set(1.0 - state.betas)
    return probs


def mixco_nce(preds: jax.Array, targs: jax.Array, temp: float = 0.1,
              state: Optional[MixcoState] = None,
              bidirectional: bool = True) -> jax.Array:
    """Bidirectional InfoNCE with optional mixup soft targets
    (reference utils.py:185-203). Inputs are expected L2-normalized rows."""
    brain_clip = (preds @ targs.T) / temp
    if state is not None:
        probs = _mix_probs(state)
        loss = -(jax.nn.log_softmax(brain_clip, axis=-1) * probs).sum(-1).mean()
        if bidirectional:
            loss2 = -(jax.nn.log_softmax(brain_clip.T, axis=-1) * probs.T).sum(-1).mean()
            loss = (loss + loss2) / 2
        return loss
    labels = jnp.arange(brain_clip.shape[0])
    loss = _xent(brain_clip, labels)
    if bidirectional:
        loss = (loss + _xent(brain_clip.T, labels)) / 2
    return loss


def _xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def soft_clip_loss(preds: jax.Array, targs: jax.Array,
                   temp: float = 0.125) -> jax.Array:
    """SoftCLIP (reference utils.py:127-134): CLIP-teacher-softened
    bidirectional contrastive loss. Rows should be L2-normalized."""
    clip_clip = (targs @ targs.T) / temp
    brain_clip = (preds @ targs.T) / temp
    soft = jax.nn.softmax(clip_clip, axis=-1)
    loss1 = -(jax.nn.log_softmax(brain_clip, axis=-1) * soft).sum(-1).mean()
    loss2 = -(jax.nn.log_softmax(brain_clip.T, axis=-1) * soft).sum(-1).mean()
    return (loss1 + loss2) / 2


def dice_loss(pred_logits: jax.Array, mask: jax.Array,
              smooth: float = 1e-7) -> jax.Array:
    """Dice loss on sigmoid logits (reference utils.py:229-245)."""
    p = jax.nn.sigmoid(pred_logits)
    intersection = jnp.sum(p * mask)
    union = jnp.sum(p) + jnp.sum(mask)
    return 1.0 - (2.0 * intersection + smooth) / (union + smooth)


def temporal_consistency_loss(masks: jax.Array, n_frames: int = 6) -> jax.Array:
    """L1 between consecutive frames (reference utils.py:207-226).
    `masks` is [(B*F), C, H, W]; reshaped to [B, F, C, H, W]."""
    bf = masks.shape[0]
    m = masks.reshape(bf // n_frames, n_frames, *masks.shape[1:])
    diffs = jnp.abs(m[:, :-1] - m[:, 1:])
    return diffs.mean()


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Multi-label BCE (reference train_neurons.py:329, nn.BCEWithLogitsLoss)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(labels * log_p + (1 - labels) * log_not_p).mean()


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = 0,
                         label_smoothing: float = 0.1) -> jax.Array:
    """Token CE with ignore_index + label smoothing
    (reference train_neurons.py:328: CrossEntropyLoss(ignore_index=0,
    label_smoothing=0.1))."""
    n_classes = logits.shape[-1]
    logits = logits.reshape(-1, n_classes)
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    # torch label smoothing: (1 - eps) * nll + eps * mean_over_classes(-logp)
    per_tok = (1.0 - label_smoothing) * nll + label_smoothing * (-logp.mean(-1))
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, per_tok, 0.0).sum() / denom


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(pred - target).mean()


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.square(pred - target).mean()


# ---------------------------------------------------------------------------
# Retrieval metrics (reference utils.py:83-110)
# ---------------------------------------------------------------------------

def batchwise_cosine_similarity(z: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise cosine-similarity matrix, transposed to match the reference's
    convention (reference utils.py:83-89 returns sim.T)."""
    z = z.reshape(z.shape[0], -1)
    b = b.reshape(b.shape[0], -1)
    zn = jnp.linalg.norm(z, axis=1, keepdims=True)
    bn = jnp.linalg.norm(b, axis=1, keepdims=True)
    return ((z @ b.T) / (zn @ bn.T)).T


def topk_accuracy(similarities: jax.Array, labels: jax.Array, k: int = 5) -> jax.Array:
    """Fraction of rows whose label is within top-k (reference utils.py:104-110,
    which sums per-rank hit fractions over the top-k ranks)."""
    k = min(k, similarities.shape[0])
    order = jnp.argsort(similarities, axis=1)
    hits = 0.0
    for i in range(k):
        hits = hits + (order[:, -(i + 1)] == labels).mean()
    return hits


def cosine_anneal(start: float, end: float, steps: int) -> jax.Array:
    """Temperature schedule (reference utils.py:258-259)."""
    if steps <= 1:
        return jnp.asarray([start])
    t = jnp.arange(steps)
    return end + (start - end) / 2 * (1 + jnp.cos(jnp.pi * t / (steps - 1)))


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def check_loss(loss: jax.Array, name: str = "loss") -> jax.Array:
    """NaN guard (reference utils.py:254-256 raises on NaN losses). Under
    jit this uses checkify-free debug callbacks: the loss is returned
    unchanged and a non-finite value triggers a host-side error print; for
    a hard stop enable `jax.config.update("jax_debug_nans", True)` (the
    CLI's --debug_nans)."""
    import jax.debug

    def _warn(ok, val):
        if not ok:
            print(f"!! non-finite {name}: {val}")

    jax.debug.callback(_warn, jnp.isfinite(loss).all(), loss)
    return loss


def count_params(params) -> int:
    """Total parameter count (reference utils.py:248-252)."""
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params)
               if hasattr(p, "shape"))
