"""Stage-6 metric runner (reference run_metrics.py).

Reads the GT||pred GIFs from `gen_videos_{mode}`, splits along width, and
computes the full report: video 2/50-way (VideoMAE protocol), CLIP-pcc,
then per-frame SSIM / PSNR / 2/50-way (ViT protocol). Classifier/embedder
networks are injected callables (our flax ViT/CLIP with imported weights);
with `classifiers=None` only the pixel metrics run — useful before foreign
weights are downloaded.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import numpy as np

from neurons_tpu.evaluation import metrics as M
from neurons_tpu.pipelines.io import load_gif, split_gt_pred


@dataclass
class MetricClassifiers:
    """Injected foreign networks for the semantic metrics."""

    img_probs_fn: Optional[Callable] = None    # frame -> [1000] softmax
    img_logits_fn: Optional[Callable] = None   # frame -> [1000] logits
    video_probs_fn: Optional[Callable] = None  # video -> [400] softmax
    video_logits_fn: Optional[Callable] = None
    clip_embed_fn: Optional[Callable] = None   # frames -> [F, D]


def build_metric_classifiers(weights_dir: str, num_frames: int = 6
                             ) -> Optional[MetricClassifiers]:
    """Assemble the semantic-metric networks from downloaded HF state
    dicts (reference run_metrics.py loads google/vit-base-patch16-224,
    MCG-NJU/videomae-base-finetuned-kinetics and CLIP ViT-L from the hub).
    Expects `vit_base.pt`, `videomae_kinetics.pt`, `clip_vit_l.pt` under
    weights_dir; returns None (pixel-metrics-only mode) when absent.
    `num_frames` must match the evaluated clips (the reference sizes
    VideoMAE by gt_list.shape[1], run_metrics.py:65); all fns take raw
    uint8 HWC frames and apply the processor-equivalent preprocessing."""
    import jax
    import jax.numpy as jnp

    paths = {n: os.path.join(weights_dir, f)
             for n, f in (("vit", "vit_base.pt"),
                          ("videomae", "videomae_kinetics.pt"),
                          ("clip", "clip_vit_l.pt"))}
    if not any(os.path.exists(p) for p in paths.values()):
        return None
    import torch

    from neurons_tpu.interop import torch_import as TI
    from neurons_tpu.models.vit import ViTClassifier, ViTConfig

    def _sd(path):
        sd = torch.load(path, map_location="cpu")
        return sd.get("state_dict", sd)

    def _prep(frames_hwc, size, mean, std):
        """uint8 [..., H, W, 3] -> float [..., 3, size, size], normalized
        (the processor-equivalents of ViTImageProcessor /
        VideoMAEImageProcessor / CLIPProcessor the reference applies,
        eval_metrics.py:99-100,134-135)."""
        x = jnp.asarray(frames_hwc, jnp.float32) / 255.0
        x = jnp.moveaxis(x, -1, -3)                       # channels first
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        x = jax.image.resize(x, (x.shape[0], 3, size, size), "bilinear")
        m = jnp.asarray(mean).reshape(1, 3, 1, 1)
        s = jnp.asarray(std).reshape(1, 3, 1, 1)
        x = (x - m) / s
        return x.reshape(lead + (3, size, size))

    IMAGENET = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    HALF = ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))  # ViTImageProcessor default
    CLIP_NORM = ((0.48145466, 0.4578275, 0.40821073),
                 (0.26862954, 0.26130258, 0.27577711))

    out = MetricClassifiers()
    if os.path.exists(paths["vit"]):
        cfg = ViTConfig.vit_base_224()
        params, _ = TI.import_hf_vit_classifier(_sd(paths["vit"]),
                                                cfg.layers)
        m = ViTClassifier(cfg)
        logits = jax.jit(lambda x: m.apply({"params": params}, x))

        def _img_logits(frame_hwc):
            x = _prep(frame_hwc, 224, *HALF)[None]
            return np.asarray(logits(x))[0]

        out.img_logits_fn = _img_logits
        out.img_probs_fn = lambda f: np.asarray(
            jax.nn.softmax(jnp.asarray(_img_logits(f))))
    if os.path.exists(paths["videomae"]):
        cfg = ViTConfig.videomae_kinetics(num_frames=num_frames)
        n_tok = (cfg.num_frames // cfg.tubelet_size) * \
            (cfg.image_size // cfg.patch_size) ** 2
        params, _ = TI.import_videomae_classifier(_sd(paths["videomae"]),
                                                  cfg.layers, n_tok)
        m = ViTClassifier(cfg)
        logits = jax.jit(lambda x: m.apply({"params": params}, x))

        def _vid_logits(frames_fhwc):
            x = _prep(frames_fhwc, 224, *IMAGENET)[None]  # [1, F, 3, H, W]
            return np.asarray(logits(x))[0]

        out.video_logits_fn = _vid_logits
        out.video_probs_fn = lambda f: np.asarray(
            jax.nn.softmax(jnp.asarray(_vid_logits(f))))
    if os.path.exists(paths["clip"]):
        from neurons_tpu.models.clip import (CLIPVisionConfig,
                                             CLIPVisionTower)
        cfg = CLIPVisionConfig.vit_l14()
        params, _ = TI.import_hf_clip_vision(_sd(paths["clip"]), cfg.layers)
        tower = CLIPVisionTower(cfg)
        feats = jax.jit(lambda x: tower.apply({"params": params}, x)[0])
        out.clip_embed_fn = lambda frames: np.asarray(feats(
            _prep(frames, cfg.image_size, *CLIP_NORM)))
    return out


def load_gif_dir(data_path: str, workers: int = 8):
    """Threaded load of the 1200-clip GIF directory (reference
    run_metrics.py:36-47 reads sequentially); the native decoder releases
    the GIL so threads scale."""
    from concurrent.futures import ThreadPoolExecutor

    names = [f for f in sorted(os.listdir(data_path)) if f.endswith(".gif")]
    with ThreadPoolExecutor(max_workers=workers) as pool:
        gifs = list(pool.map(
            lambda f: load_gif(os.path.join(data_path, f)), names))
    gts, preds = [], []
    for gif in gifs:
        gt, pred = split_gt_pred(gif)
        gts.append(gt)
        preds.append(pred)
    return np.stack(gts), np.stack(preds)


def run_metrics(data_path: str,
                classifiers: Optional[MetricClassifiers] = None,
                num_trials: int = 100, top_k: int = 1,
                verbose: bool = True) -> Dict[str, float]:
    """reference run_metrics.py:20-146. Returns the metric dict."""
    gt_list, pred_list = load_gif_dir(data_path)
    report: Dict[str, float] = {}
    c = classifiers or MetricClassifiers()

    if c.clip_embed_fn is not None:
        m, s = M.clip_pcc(c.clip_embed_fn, list(pred_list))
        report["clip_pcc"] = m
        report["clip_pcc_std"] = s

    if c.video_probs_fn is not None:
        for n_way in (2, 50):
            accs = M.classify_nway_metric(
                c.video_probs_fn, c.video_logits_fn or c.video_probs_fn,
                list(pred_list), list(gt_list), n_way=n_way,
                num_trials=num_trials, top_k=top_k)
            report[f"video_{n_way}way"] = float(np.mean(accs))

    n_frames = pred_list.shape[1]
    ssim_l, psnr_l = [], []
    frame_2way, frame_50way = [], []
    for i in range(n_frames):
        sm, _ = M.ssim_score(pred_list[:, i], gt_list[:, i])
        pm, _ = M.psnr_score(pred_list[:, i].astype(np.float32),
                             gt_list[:, i].astype(np.float32))
        ssim_l.append(sm)
        psnr_l.append(pm)
        if c.img_probs_fn is not None:
            for n_way, acc_list in ((2, frame_2way), (50, frame_50way)):
                accs = M.classify_nway_metric(
                    c.img_probs_fn, c.img_logits_fn or c.img_probs_fn,
                    list(pred_list[:, i]), list(gt_list[:, i]),
                    n_way=n_way, num_trials=num_trials, top_k=top_k)
                acc_list.append(float(np.mean(accs)))

    report["ssim"] = float(np.mean(ssim_l))
    report["psnr"] = float(np.mean(psnr_l))
    if frame_2way:
        report["frame_2way"] = float(np.mean(frame_2way))
        report["frame_50way"] = float(np.mean(frame_50way))

    if verbose:
        print("======== Video-based ========")
        for k in ("video_2way", "video_50way", "clip_pcc"):
            if k in report:
                print(f"  {k}: {report[k]:.4f}")
        print("======== Frame-based ========")
        for k in ("frame_2way", "frame_50way", "ssim", "psnr"):
            if k in report:
                print(f"  {k}: {report[k]:.4f}")
    return report
