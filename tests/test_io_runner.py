"""Artifact IO + stage-6 runner tests with synthetic GIFs."""

import os

import numpy as np
import pytest

from neurons_tpu.pipelines import io
from neurons_tpu.evaluation.runner import MetricClassifiers, run_metrics


def test_stage3_artifact_roundtrip(tmp_path):
    p = str(tmp_path / "frames_generated")
    g = np.random.default_rng(0)
    recons = g.uniform(size=(3, 3, 16, 16)).astype(np.float32)
    gts = g.uniform(size=(3, 3, 16, 16)).astype(np.float32)
    blurry = g.uniform(size=(3, 6, 3, 16, 16)).astype(np.float32)
    io.save_stage3_artifacts(p, 1, all_recons=recons, all_gts=gts,
                             captions=["a dog", "a cat", "a car"],
                             blurry_videos=blurry)
    out = io.load_stage3_artifacts(p, 1)
    np.testing.assert_allclose(out["all_recons"], recons)
    assert out["captions"] == ["a dog", "a cat", "a car"]


def test_gif_roundtrip_and_split(tmp_path):
    g = np.random.default_rng(1)
    # one "video": GT and pred side by side, [1, F, 3, H, 2W]
    gt = g.uniform(size=(1, 4, 3, 16, 16)).astype(np.float32)
    pred = g.uniform(size=(1, 4, 3, 16, 16)).astype(np.float32)
    side = np.concatenate([gt, pred], axis=-1)
    path = str(tmp_path / "test1.gif")
    io.save_video_grid(side, path)
    frames = io.load_gif(path)
    assert frames.shape == (4, 16, 32, 3)
    gt2, pred2 = io.split_gt_pred(frames)
    assert gt2.shape == (4, 16, 16, 3)
    # GIF is palette-quantized; just check gross structure survives
    err = np.abs(gt2 / 255.0 - gt[0].transpose(0, 2, 3, 1)).mean()
    assert err < 0.12


def test_run_metrics_pixel_only(tmp_path):
    g = np.random.default_rng(2)
    d = tmp_path / "gen_videos_enhance"
    d.mkdir()
    for i in range(3):
        gt = g.uniform(size=(1, 4, 3, 16, 16)).astype(np.float32)
        side = np.concatenate([gt, gt], axis=-1)  # pred == gt
        io.save_video_grid(side, str(d / f"test{i}.gif"))
    report = run_metrics(str(d), verbose=False)
    assert report["ssim"] > 0.75   # palette quantization costs a little
    assert report["psnr"] > 25
    assert "frame_2way" not in report  # no classifiers injected


def test_run_metrics_with_injected_classifiers(tmp_path):
    g = np.random.default_rng(3)
    d = tmp_path / "gen_videos_x"
    d.mkdir()
    for i in range(2):
        gt = g.uniform(size=(1, 4, 3, 16, 16)).astype(np.float32)
        side = np.concatenate([gt, gt], axis=-1)
        io.save_video_grid(side, str(d / f"t{i}.gif"))

    def probs(x):
        p = np.zeros(64)
        p[int(np.asarray(x).sum()) % 64] = 1.0
        return p

    def video_probs(x):
        p = np.zeros(64)
        p[1] = 1.0
        return p

    def embed(frames):
        return np.ones((len(frames), 8))

    cls = MetricClassifiers(img_probs_fn=probs, img_logits_fn=probs,
                            video_probs_fn=video_probs,
                            video_logits_fn=video_probs,
                            clip_embed_fn=embed)
    report = run_metrics(str(d), cls, num_trials=10, verbose=False)
    # pred == gt and the classifiers are deterministic -> perfect accuracy
    assert report["frame_2way"] == 1.0
    assert report["video_2way"] == 1.0
    np.testing.assert_allclose(report["clip_pcc"], 1.0, rtol=1e-6)
