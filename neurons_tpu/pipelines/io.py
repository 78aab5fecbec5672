"""Artifact IO: the EXP/exp_{exp}/subj_{subj}/ contract + GIF writing.

Mirrors the reference's on-disk layout so stages interoperate (reference
recon_keyframe_neurons.py:448-451 producer -> scripts/neuroclips_video.py:
170-191 consumer; GIF writer animatediff/utils/util.py:61-74
`save_videos_grid`). Tensors are stored as .npz (and readable back as
numpy); filenames keep the reference stems so a user of the reference finds
the same artifacts.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def exp_dir(root: str, exp: str, subj: int) -> str:
    return os.path.join(root, f"exp_{exp}", f"subj_{subj}")


def stage3_dir(root: str, exp: str, subj: int, enhance: bool) -> str:
    tag = "frames_generated_enhance" if enhance else "frames_generated"
    return os.path.join(exp_dir(root, exp, subj), tag)


def video_dir(root: str, exp: str, subj: int, mode: str) -> str:
    return os.path.join(exp_dir(root, exp, subj), f"gen_videos_{mode}")


def save_stage3_artifacts(path: str, subj: int, *, all_recons: np.ndarray,
                          all_gts: np.ndarray, captions: Sequence[str],
                          blurry_videos: np.ndarray) -> None:
    """reference recon_keyframe_neurons.py:448-451 contract:
    {subj}_all_recons / recon_videos / pred_test_caption_self."""
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, f"subj{subj:02d}_all_recons.npz"),
             all_recons=all_recons, all_gts=all_gts)
    np.savez(os.path.join(path, "recon_videos.npz"), videos=blurry_videos)
    with open(os.path.join(path, "pred_test_caption_self.txt"), "w") as f:
        f.write("\n".join(captions))


def load_stage3_artifacts(path: str, subj: int) -> Dict[str, np.ndarray]:
    recons = np.load(os.path.join(path, f"subj{subj:02d}_all_recons.npz"))
    videos = np.load(os.path.join(path, "recon_videos.npz"))
    caps_path = os.path.join(path, "pred_test_caption_self.txt")
    captions: List[str] = []
    if os.path.exists(caps_path):
        captions = open(caps_path).read().splitlines()
    return {"all_recons": recons["all_recons"], "all_gts": recons["all_gts"],
            "blurry_videos": videos["videos"], "captions": captions}


def save_video_grid(videos: np.ndarray, path: str, fps: int = 8,
                    rescale: bool = False) -> None:
    """GIF writer (reference animatediff/utils/util.py:61-74): stack videos
    side by side per frame and write a GIF. videos [N, F, 3, H, W] or
    [N, 3, F, H, W] in [0, 1] (rescale=True maps [-1,1]->[0,1]).
    Uses the native threaded codec (native/neurons_io.cpp) when built,
    imageio otherwise."""
    v = np.asarray(videos)
    if v.shape[2] == 3 and v.shape[1] != 3:
        pass  # already [N, F, 3, H, W]
    elif v.shape[1] == 3:
        v = v.transpose(0, 2, 1, 3, 4)
    if rescale:
        v = (v + 1.0) / 2.0
    v = np.clip(v, 0, 1)
    frames = []
    for f in range(v.shape[1]):
        row = np.concatenate(list(v[:, f]), axis=-1)  # side-by-side on W
        frames.append((row.transpose(1, 2, 0) * 255).astype(np.uint8))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    from neurons_tpu import native_io
    data = native_io.encode_gif(np.stack(frames),
                                delay_ms=int(1000 / fps))
    if data is not None:
        with open(path, "wb") as fh:
            fh.write(data)
        return
    import imageio

    # imageio >= 2.28 interprets GIF `duration` in ms; the legacy Pillow
    # plugin used seconds — convert per installed version
    ver = tuple(int(x) for x in imageio.__version__.split(".")[:2])
    duration = 1000 / fps if ver >= (2, 28) else 1 / fps
    imageio.mimsave(path, frames, duration=duration, loop=0)


def load_gif(path: str) -> np.ndarray:
    """-> [F, H, W, 3] uint8. Native decoder fast path; imageio fallback
    for exotic GIFs (interlaced etc.)."""
    from neurons_tpu import native_io
    with open(path, "rb") as fh:
        data = fh.read()
    frames = native_io.decode_gif(data)
    if frames is not None:
        return frames
    import imageio

    frames = imageio.mimread(path)
    return np.stack([np.asarray(f)[..., :3] for f in frames])


def split_gt_pred(gif_frames: np.ndarray):
    """Stage-6 input convention (reference run_metrics.py:36-42): each GIF
    frame is GT ++ pred concatenated along width; split in half."""
    gt, pred = np.split(gif_frames, 2, axis=2)
    return gt, pred
