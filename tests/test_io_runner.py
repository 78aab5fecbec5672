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


def test_stage3_pt_dialect_exact_names(tmp_path):
    """Our saver writes the reference's exact .pt files, loadable with
    plain torch.load (reference recon_keyframe_neurons.py:448-451)."""
    import torch

    p = str(tmp_path / "frames_generated")
    g = np.random.default_rng(4)
    recons = g.uniform(size=(2, 3, 8, 8)).astype(np.float32)
    io.save_stage3_artifacts(
        p, 2, all_recons=recons,
        all_gts=g.uniform(size=(2, 3, 8, 8)).astype(np.float32),
        captions=["a bird", "a boat"],
        blurry_videos=g.uniform(size=(2, 6, 3, 8, 8)).astype(np.float32))
    t = torch.load(os.path.join(p, "video_subj02_all_recons.pt"),
                   weights_only=False)
    assert isinstance(t, torch.Tensor) and tuple(t.shape) == (2, 3, 8, 8)
    np.testing.assert_allclose(t.numpy(), recons)
    for name in ("video_subj02_all_gts.pt", "recon_videos.pt"):
        assert isinstance(torch.load(os.path.join(p, name),
                                     weights_only=False), torch.Tensor)
    caps = torch.load(os.path.join(p, "pred_test_caption_self.pt"),
                      weights_only=False)
    assert isinstance(caps, np.ndarray) and caps.dtype == object
    assert list(caps) == ["a bird", "a boat"]


def test_load_reference_produced_dump(tmp_path):
    """A directory written the way the reference writes it (torch tensors,
    np.hstack caption array, flat [N*6,3,H,W] recon_videos) loads through
    our loader, including stage-4 caption preference."""
    import torch

    p = tmp_path / "frames_generated"
    p.mkdir()
    g = np.random.default_rng(5)
    recons = torch.from_numpy(g.uniform(size=(3, 3, 8, 8)).astype("f"))
    torch.save(recons, str(p / "video_subj01_all_recons.pt"))
    torch.save(recons.clone(), str(p / "video_subj01_all_gts.pt"))
    blurry = torch.from_numpy(g.uniform(size=(18, 3, 8, 8)).astype("f"))
    torch.save(blurry, str(p / "recon_videos.pt"))  # reference flat layout
    torch.save(np.hstack(([], ["x", "y", "z"])),
               str(p / "pred_test_caption_self.pt"))
    out = io.load_stage3_artifacts(str(p), 1)
    assert out["blurry_videos"].shape == (3, 6, 3, 8, 8)
    np.testing.assert_allclose(out["all_recons"], recons.numpy())
    assert out["captions"] == ["x", "y", "z"]
    # stage-4 captions take precedence in auto mode; 'self' still selects
    # the stage-3 ones (reference neuroclips_video.py:186-191)
    io.save_caption_artifact(str(p), ["blip a", "blip b", "blip c"])
    assert io.load_stage3_artifacts(str(p), 1)["captions"][0] == "blip a"
    assert io.load_captions(str(p), "self") == ["x", "y", "z"]


def test_legacy_npz_artifacts_still_readable(tmp_path):
    p = tmp_path / "frames_generated"
    p.mkdir()
    g = np.random.default_rng(6)
    r = g.uniform(size=(2, 3, 8, 8)).astype(np.float32)
    np.savez(str(p / "subj01_all_recons.npz"), all_recons=r, all_gts=r)
    np.savez(str(p / "recon_videos.npz"),
             videos=g.uniform(size=(2, 6, 3, 8, 8)).astype(np.float32))
    (p / "pred_test_caption_self.txt").write_text("old a\nold b")
    out = io.load_stage3_artifacts(str(p), 1)
    np.testing.assert_allclose(out["all_recons"], r)
    assert out["captions"] == ["old a", "old b"]


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


def test_gif_artifact_name_reference_dialect():
    # reference scripts/neuroclips_video.py:318-327:
    # prompt = "-".join(prompt.replace("/", "").split(" "))
    assert io.gif_artifact_name(7, "a man walking") == "7-a-man-walking.gif"
    # '/' is dropped (not replaced by a separator)
    assert io.gif_artifact_name(0, "cat/dog runs") == "0-catdog-runs.gif"
    # double spaces produce the reference's empty tokens
    assert io.gif_artifact_name(3, "a  b") == "3-a--b.gif"
    assert io.gif_artifact_name(12, "") == "12-.gif"


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
