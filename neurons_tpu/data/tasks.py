"""Offline task construction (reference tasks_construction/).

Rule-based key-object discovery (reference find_key_obj.py:140-434) and GT
caption embedding (gen_GT_clip_embeds.py:9-49), as plain numpy — these run
once, host-side, ahead of training.

Key-object rule (reference :205-275): per category, accumulate inter-frame
mask-centroid displacement (2x boost for PRIORITY animal/people
categories); exclude BACKGROUND categories; prefer priority categories,
else filter to area ratio < 50%; emit the top-k categories, the per-frame
masks of the winner, and `key_objects_info_{mode}.json` +
`key_objects_masks_{mode}` arrays.
"""

from __future__ import annotations

import json
import os
import re
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from neurons_tpu.data.categories import (BACKGROUND_CATEGORIES,
                                         PRIORITY_CATEGORIES)


def load_masks_from_png(mask_dir: str, json_data: Dict) -> Dict:
    """reference find_key_obj.py:140-187: parse mask_{vid}_f{frame}_{label}
    .png files into {video: {frame: {label: {segmentation, category}}}}."""
    from PIL import Image

    masks: Dict[int, Dict[int, Dict[int, Dict]]] = {}
    for mask_file in os.listdir(mask_dir):
        m = re.match(r"mask_(\d+)_f(\d+)_(\d+).png", mask_file)
        if not m:
            continue
        video_id, frame_id, label = int(m.group(1)), int(m.group(2)), m.group(3)
        key = f"mask_{video_id}_f{frame_id}"
        if key not in json_data or label not in json_data[key]:
            continue
        arr = np.array(Image.open(os.path.join(mask_dir, mask_file)))
        masks.setdefault(video_id, {}).setdefault(frame_id, {})[int(label)] = {
            "segmentation": arr, "category": json_data[key][label]}
    return masks


def calculate_center(segmentation: np.ndarray) -> Optional[Tuple[float, float]]:
    ys, xs = np.where(segmentation > 0)
    if len(ys) == 0:
        return None
    return float(xs.mean()), float(ys.mean())


def select_key_objects_for_video(video_masks: Dict, top_k: int = 3
                                 ) -> List[str]:
    """reference find_key_obj.py:205-275."""
    object_changes: Dict[str, float] = defaultdict(float)
    object_sizes: Dict[str, float] = defaultdict(float)
    frame_ids = sorted(video_masks.keys())

    for i in range(1, len(frame_ids)):
        prev_masks = video_masks[frame_ids[i - 1]]
        curr_masks = video_masks[frame_ids[i]]
        for label, info in curr_masks.items():
            category = info["category"]
            if category in BACKGROUND_CATEGORIES:
                continue
            curr_center = calculate_center(info["segmentation"])
            if curr_center is None or label not in prev_masks:
                continue
            prev_center = calculate_center(prev_masks[label]["segmentation"])
            if prev_center is None:
                continue
            displacement = float(np.hypot(curr_center[0] - prev_center[0],
                                          curr_center[1] - prev_center[1]))
            if category in PRIORITY_CATEGORIES:
                displacement *= 2  # reference's priority boost
            object_changes[category] += displacement
            seg = info["segmentation"]
            object_sizes[category] = float((seg > 0).sum()) / seg.size

    ranked = sorted(object_changes.items(), key=lambda x: x[1], reverse=True)
    priority = [c for c, _ in ranked if c in PRIORITY_CATEGORIES]
    if priority:
        return priority[:top_k]
    filtered = [c for c, _ in ranked if object_sizes[c] < 0.5]
    if not filtered:
        filtered = [c for c, _ in ranked]
    return filtered[:top_k]


def select_key_objects_for_all_videos(masks: Dict, num_videos: int,
                                      n_frames: int = 6, hw: int = 224,
                                      top_k: int = 1
                                      ) -> Tuple[Dict, np.ndarray]:
    """reference find_key_obj.py:325-399: per video, the winning category
    and its per-frame masks ([N, F, H, W], zeros when absent)."""
    video_key_objects: Dict[int, Dict[str, str]] = {}
    all_masks = np.zeros((num_videos, n_frames, hw, hw), np.float32)

    for video_id, video_masks in masks.items():
        key_objects = select_key_objects_for_video(video_masks, top_k)
        category = key_objects[0] if key_objects else "None"
        if key_objects:
            for frame_id in range(n_frames):
                for label, info in video_masks.get(frame_id, {}).items():
                    if info["category"] == category:
                        all_masks[video_id, frame_id] = info["segmentation"]
        video_key_objects[video_id] = {"category": category}
    return video_key_objects, all_masks


def build_key_object_files(mask_dir: str, masks_json_path: str,
                           out_dir: str, mode: str,
                           num_videos: int = 4320, n_frames: int = 6,
                           hw: int = 224) -> None:
    """The reference's __main__ (find_key_obj.py:402-434): writes
    key_objects_info_{mode}.json + key_objects_masks_{mode}.npz."""
    json_data = json.load(open(masks_json_path))
    masks = load_masks_from_png(mask_dir, json_data)
    key_objects, all_masks = select_key_objects_for_all_videos(
        masks, num_videos, n_frames=n_frames, hw=hw)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"key_objects_info_{mode}.json"),
              "w") as f:
        json.dump({str(k): v for k, v in
                   sorted(key_objects.items())}, f, indent=4)
    np.savez(os.path.join(out_dir, f"key_objects_masks_{mode}.npz"),
             masks=all_masks)
    # ALSO write the .pt the training loader consumes (cc2017.load_split
    # reads masks/key_objects_masks_train.pt, matching the reference's
    # torch.save output, find_key_obj.py:434)
    import torch
    torch.save(torch.from_numpy(all_masks),
               os.path.join(out_dir, f"key_objects_masks_{mode}.pt"))


def gen_caption_embeds(captions: Sequence[str],
                       embed_fn: Callable[[Sequence[str]], np.ndarray],
                       out_dir: str, mode: str,
                       batch_size: int = 64) -> np.ndarray:
    """reference gen_GT_clip_embeds.py:9-49: embed Qwen captions with the
    CLIP-bigG text tower (pooled 1280-d); writes the reference's exact
    artifact names — `GT_{mode}_caption_qwen.pt` (the caption list) and
    `GT_{mode}_caption_qwen_emb.pt` (f32 tensor) — so downstream
    reference consumers (gen_decoupled_outputs.py:223-224) interoperate.
    `embed_fn` is the batched text embedder. Falls back to .txt/.npy when
    torch is unavailable."""
    embs = []
    for start in range(0, len(captions), batch_size):
        embs.append(np.asarray(embed_fn(captions[start:start + batch_size])))
    all_embs = np.concatenate(embs, axis=0)
    os.makedirs(out_dir, exist_ok=True)
    try:
        import torch
        # numpy string array, not a Python list: the reference saves
        # np.hstack(captions) (gen_GT_clip_embeds.py) and downstream
        # array ops (.shape, fancy indexing) must behave identically
        torch.save(np.asarray(list(captions)),
                   os.path.join(out_dir, f"GT_{mode}_caption_qwen.pt"))
        torch.save(torch.from_numpy(np.asarray(all_embs, np.float32)),
                   os.path.join(out_dir, f"GT_{mode}_caption_qwen_emb.pt"))
    except ImportError:
        with open(os.path.join(out_dir,
                               f"GT_{mode}_caption_qwen.txt"), "w") as f:
            f.write("\n".join(captions))
        np.save(os.path.join(out_dir, f"GT_{mode}_caption_qwen_emb.npy"),
                all_embs)
    return all_embs
