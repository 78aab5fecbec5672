"""Stage-6 metric suite (reference eval_metrics.py), on-device.

Implements the reference's metric *protocols* exactly, with the foreign
classifier networks injected as callables (classify_fn/embed_fn — our flax
ViT / CLIP models with imported weights, or any other):

  n_way_top_k_acc     — reference eval_metrics.py:57-70: correct class +
                        (n_way-1) random distractors, top-k over the subset,
                        `num_trials` resamples; per reference usage the GT
                        label set is the GT-classifier's top-3.
  img/video_classify  — reference :72-142 protocol wrappers
  SSIM                — reference :235-238: rgb2gray, gaussian weights
                        sigma 1.5 (truncate 3.5 -> 11x11), sample-cov off,
                        data_range 1.0 (skimage-equivalent, from scratch)
  PSNR                — reference :259-260, data_range 255
  CLIP-pcc            — reference :294-315: mean off-diagonal cosine of a
                        clip's frame embeddings
  remove_overlap      — reference :265-287 scene dedup

SSIM/PSNR are jittable jnp; the n-way protocol is host-side numpy (it is
trial-resampling logic over tiny vectors, not TPU work).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights (skimage rgb2gray)
_RGB2GRAY = jnp.asarray([0.2125, 0.7154, 0.0721])


def rgb2gray(img: jax.Array) -> jax.Array:
    """img [..., H, W, 3] in [0, 255] -> gray [..., H, W] in [0, 1]."""
    return (img / 255.0) @ _RGB2GRAY


def _gaussian_kernel1d(sigma: float = 1.5, truncate: float = 3.5
                       ) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d_nearest(img: jax.Array, k: np.ndarray) -> jax.Array:
    """Separable filtering with edge (nearest) padding, matching
    scipy.ndimage mode='nearest'. img [H, W]."""
    r = (len(k) - 1) // 2
    kj = jnp.asarray(k)
    p = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for i in range(len(k)):
        out = out + kj[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[0], 0)
    p = jnp.pad(out, ((0, 0), (r, r)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i in range(len(k)):
        out2 = out2 + kj[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[1], 1)
    return out2


def ssim_gray(img1: jax.Array, img2: jax.Array, sigma: float = 1.5,
              data_range: float = 1.0, truncate: float = 3.5) -> jax.Array:
    """Gaussian-weighted SSIM on single-channel images (skimage-equivalent:
    gaussian_weights=True, use_sample_covariance=False). img [H, W]."""
    k = _gaussian_kernel1d(sigma, truncate)
    pad = (len(k) - 1) // 2
    f = lambda x: _filter2d_nearest(x, k)
    ux, uy = f(img1), f(img2)
    uxx, uyy, uxy = f(img1 * img1), f(img2 * img2), f(img1 * img2)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return s[pad:-pad, pad:-pad].mean()


def ssim_score(pred: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """reference ssim_score_only (:216-228): per-frame rgb2gray SSIM.
    pred/gt: [N, H, W, 3] (or [N, 3, H, W]) in 0-255."""
    pred = _channel_last(pred)
    gt = _channel_last(gt)
    fn = jax.jit(lambda a, b: ssim_gray(rgb2gray(a), rgb2gray(b)))
    scores = [float(fn(jnp.asarray(p, jnp.float32),
                       jnp.asarray(g, jnp.float32)))
              for p, g in zip(pred, gt)]
    return float(np.mean(scores)), float(np.std(scores))


def psnr(img1: jax.Array, img2: jax.Array,
         data_range: float = 255.0) -> jax.Array:
    mse = jnp.mean(jnp.square(img1.astype(jnp.float32)
                              - img2.astype(jnp.float32)))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def psnr_score(pred: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """reference psnr_score_only (:245-260)."""
    fn = jax.jit(psnr)
    scores = [float(fn(jnp.asarray(p, jnp.float32),
                       jnp.asarray(g, jnp.float32)))
              for p, g in zip(_channel_last(pred), _channel_last(gt))]
    return float(np.mean(scores)), float(np.std(scores))


def mse_score(pred: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    scores = [float(np.mean((p / 255.0 - g / 255.0) ** 2))
              for p, g in zip(pred, gt)]
    return float(np.mean(scores)), float(np.std(scores))


def _channel_last(img: np.ndarray) -> np.ndarray:
    if img.shape[-1] == 3:
        return img
    if img.ndim == 3:
        return np.transpose(img, (1, 2, 0))
    if img.ndim == 4:
        return np.transpose(img, (0, 2, 3, 1))
    raise ValueError(f"bad image rank {img.ndim}")


def n_way_top_k_acc(pred: np.ndarray, class_ids, n_way: int,
                    num_trials: int = 100, top_k: int = 1,
                    rng: Optional[np.random.Generator] = None
                    ) -> Tuple[float, float]:
    """reference eval_metrics.py:57-70: for each trial draw n_way-1
    distractor classes; correct if any GT class ranks in the top_k of
    [gt ++ distractors]."""
    rng = rng or np.random.default_rng(0)
    if isinstance(class_ids, (int, np.integer)):
        class_ids = [int(class_ids)]
    class_ids = [int(c) for c in np.asarray(class_ids).reshape(-1)]
    pick_range = np.setdiff1d(np.arange(len(pred)), class_ids)
    corrects = 0
    for _ in range(num_trials):
        idxs = rng.choice(pick_range, n_way - 1, replace=False)
        for gt_id in class_ids:
            subset = np.concatenate([[pred[gt_id]], pred[idxs]])
            if 0 in np.argsort(subset)[-top_k:]:
                corrects += 1
                break
    acc = corrects / num_trials
    return acc, math.sqrt(max(acc * (1 - acc) / num_trials, 0.0))


def classify_nway_metric(pred_probs_fn: Callable[[np.ndarray], np.ndarray],
                         gt_logits_fn: Callable[[np.ndarray], np.ndarray],
                         pred_items: Sequence[np.ndarray],
                         gt_items: Sequence[np.ndarray],
                         n_way: int = 50, num_trials: int = 100,
                         top_k: int = 1, gt_top: int = 3,
                         seed: int = 0) -> List[float]:
    """The img/video classify protocol (reference :72-142): GT label set is
    the GT item's top-`gt_top` classifier classes; accuracy is the n-way
    protocol on the prediction's class probabilities."""
    rng = np.random.default_rng(seed)
    accs = []
    for pred, gt in zip(pred_items, gt_items):
        gt_ids = np.argsort(gt_logits_fn(gt).reshape(-1))[-gt_top:]
        probs = pred_probs_fn(pred).reshape(-1)
        acc, _ = n_way_top_k_acc(probs, gt_ids, n_way, num_trials, top_k,
                                 rng)
        accs.append(acc)
    return accs


def clip_pcc(embed_fn: Callable[[np.ndarray], np.ndarray],
             videos: Sequence[np.ndarray]) -> Tuple[float, float]:
    """CLIP frame-consistency (reference :294-315): per clip, mean pairwise
    off-diagonal cosine of frame embeddings."""
    scores = []
    for frames in videos:
        feats = np.asarray(embed_fn(frames))
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        sim = feats @ feats.T
        np.fill_diagonal(sim, 0.0)
        n = len(frames)
        scores.append(sim.sum() / (n * (n - 1)))
    return float(np.mean(scores)), float(np.std(scores))


def clip_similarity(embed_fn: Callable[[np.ndarray], np.ndarray],
                    pred: Sequence[np.ndarray], gt: Sequence[np.ndarray]
                    ) -> float:
    """reference clip_score_only (:179-191): mean pred/gt CLIP cosine."""
    scores = []
    for p, g in zip(pred, gt):
        fp = np.asarray(embed_fn(p[None]))[0]
        fg = np.asarray(embed_fn(g[None]))[0]
        scores.append(float(fp @ fg /
                            (np.linalg.norm(fp) * np.linalg.norm(fg))))
    return float(np.mean(scores))


def remove_overlap(pred_videos: np.ndarray, gt_videos: np.ndarray,
                   scene_seg_list: Sequence[str],
                   get_scene_seg: bool = False
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Scene dedup (reference :265-287): drop boundary clips ('-' in seg
    tag); optionally keep one clip per scene."""
    pred_list, gt_list, seen = [], [], {}
    for pred, gt, seg in zip(pred_videos, gt_videos, scene_seg_list):
        if "-" in seg:
            continue
        if get_scene_seg:
            if seg in seen:
                continue
            seen[seg] = True
        pred_list.append(pred)
        gt_list.append(gt)
    return np.stack(pred_list), np.stack(gt_list)
