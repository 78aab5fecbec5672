"""Artifact IO: the EXP/exp_{exp}/subj_{subj}/ contract + GIF writing.

Speaks the reference's on-disk dialect exactly, so the stages interoperate
with reference-produced artifacts (including the released >60 GB EXP dump)
in both directions:

  stage 3 writes  frames_generated{_enhance}/
      video_subj0{subj}_all_recons.pt     [N, 3, 256, 256] float
      video_subj0{subj}_all_gts.pt        [N, 3, H, W] float
      pred_test_caption_self.pt           numpy str array
      recon_videos.pt                     [N, 6, 3, 224, 224] float
  (reference recon_keyframe_neurons.py:448-451)
  stage 4 writes  pred_test_caption.pt    numpy str array
  (reference caption_keyframe.py:29-48)
  stage 5 reads all four (reference scripts/neuroclips_video.py:170-191)
  and writes GT-next-to-pred GIFs under gen_videos_{mode}/ (":323-327"),
  which stage 6 splits along width (reference run_metrics.py:36-42).

Legacy .npz artifacts written by earlier versions of this repo remain
readable (the loader falls back to them). The GIF writer mirrors
animatediff/utils/util.py:61-74 `save_videos_grid`.
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


def _torch_save(arr, path: str) -> None:
    import torch

    torch.save(torch.from_numpy(np.array(arr, order="C")), path)


def _torch_load(path: str) -> np.ndarray:
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(t, torch.Tensor):
        return t.float().numpy()
    return np.asarray(t)


def save_stage3_artifacts(path: str, subj: int, *, all_recons: np.ndarray,
                          all_gts: np.ndarray, captions: Sequence[str],
                          blurry_videos: np.ndarray) -> None:
    """Write the reference's four stage-3 .pt artifacts under their exact
    names (reference recon_keyframe_neurons.py:448-451), so the reference's
    own stage 4/5 scripts — and ours — can consume them. A .txt caption
    sidecar is kept for human inspection."""
    os.makedirs(path, exist_ok=True)
    stem = f"video_subj0{subj}"
    _torch_save(np.asarray(all_recons, np.float32),
                os.path.join(path, f"{stem}_all_recons.pt"))
    _torch_save(np.asarray(all_gts, np.float32),
                os.path.join(path, f"{stem}_all_gts.pt"))
    _torch_save(np.asarray(blurry_videos, np.float32),
                os.path.join(path, "recon_videos.pt"))
    import torch

    # the reference stores np.hstack'd python strings (an object ndarray,
    # recon_keyframe_neurons.py:450 <- :444 all_generated_texts)
    torch.save(np.asarray(list(captions), dtype=object),
               os.path.join(path, "pred_test_caption_self.pt"))
    with open(os.path.join(path, "pred_test_caption_self.txt"), "w") as f:
        f.write("\n".join(captions))


def save_caption_artifact(path: str, captions: Sequence[str]) -> None:
    """Stage-4 output: pred_test_caption.pt (reference
    caption_keyframe.py:48, an np.hstack str array)."""
    import torch

    os.makedirs(path, exist_ok=True)
    torch.save(np.asarray(list(captions), dtype=object),
               os.path.join(path, "pred_test_caption.pt"))
    with open(os.path.join(path, "pred_test_caption.txt"), "w") as f:
        f.write("\n".join(captions))


def load_captions(path: str, mode: str = "auto") -> List[str]:
    """Read stage-3/4 captions. mode: 'self' = stage-3 GPT-2 captions,
    'blip' = stage-4 BLIP-2 captions, 'auto' = blip if present else self
    (reference scripts/neuroclips_video.py:186-191 selects by --mode)."""
    order = {"self": ["pred_test_caption_self"],
             "blip": ["pred_test_caption"],
             "auto": ["pred_test_caption", "pred_test_caption_self"]}[mode]
    for stem in order:
        pt = os.path.join(path, stem + ".pt")
        if os.path.exists(pt):
            return [str(c) for c in _torch_load(pt).tolist()]
        txt = os.path.join(path, stem + ".txt")
        if os.path.exists(txt):
            return open(txt).read().splitlines()
    return []


def load_stage3_artifacts(path: str, subj: int,
                          caption_mode: str = "auto") -> Dict:
    """Read a stage-3 artifact directory — ours or one produced by the
    reference scripts (the released EXP dump). Falls back to this repo's
    legacy .npz layout. blurry_videos is normalized to [N, 6, 3, H, W]
    (the reference stores it reshapeable to [N*6, 3, 224, 224],
    scripts/neuroclips_video.py:179)."""
    stem = f"video_subj0{subj}"
    recons_pt = os.path.join(path, f"{stem}_all_recons.pt")
    if os.path.exists(recons_pt):
        all_recons = _torch_load(recons_pt)
        gts_pt = os.path.join(path, f"{stem}_all_gts.pt")
        all_gts = _torch_load(gts_pt) if os.path.exists(gts_pt) else None
        blurry = _torch_load(os.path.join(path, "recon_videos.pt"))
    else:  # legacy .npz layout from earlier versions of this repo
        recons = np.load(os.path.join(path, f"subj{subj:02d}_all_recons.npz"))
        all_recons, all_gts = recons["all_recons"], recons["all_gts"]
        blurry = np.load(os.path.join(path, "recon_videos.npz"))["videos"]
    if blurry.ndim == 4:  # [N*6, 3, H, W] flat layout
        blurry = blurry.reshape(-1, 6, *blurry.shape[1:])
    return {"all_recons": all_recons, "all_gts": all_gts,
            "blurry_videos": blurry,
            "captions": load_captions(path, caption_mode)}


def gif_artifact_name(org_idx: int, prompt: str) -> str:
    """Stage-5 GIF naming dialect (reference scripts/neuroclips_video.py:
    318-327): '{org_idx}-{prompt}.gif' with '/' dropped from the prompt
    and spaces dash-joined — including the reference's empty tokens for
    runs of spaces, so a reference-produced EXP dir and ours collide on
    identical names."""
    return f"{int(org_idx)}-" + \
        "-".join(str(prompt).replace("/", "").split(" ")) + ".gif"


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
