"""Offline task construction: key-object discovery rules (reference
tasks_construction/find_key_obj.py:205-399)."""

import json
import os

import numpy as np
import pytest

from neurons_tpu.data import tasks
from neurons_tpu.data.categories import (BACKGROUND_CATEGORIES,
                                         PRIORITY_CATEGORIES)


def _mask(h=16, w=16, cx=4, cy=4, r=2):
    m = np.zeros((h, w), np.uint8)
    m[max(0, cy - r):cy + r, max(0, cx - r):cx + r] = 1
    return m


def _video(cat_a="car", cat_b="tree", move_a=3, move_b=0):
    """Two objects: label 1 = cat_a (moving), label 2 = cat_b (static)."""
    frames = {}
    for f in range(4):
        frames[f] = {
            1: {"segmentation": _mask(cx=4 + move_a * f, cy=4),
                "category": cat_a},
            2: {"segmentation": _mask(cx=12, cy=12), "category": cat_b},
        }
    return frames


class TestKeyObjectRules:
    def test_moving_object_wins(self):
        got = tasks.select_key_objects_for_video(_video())
        assert got[0] == "car"

    def test_priority_category_boost(self):
        # a slightly-moving person beats a faster-moving car (2x boost)
        pri = next(iter(PRIORITY_CATEGORIES))
        v = _video(cat_a="car", move_a=2)
        for f in v:
            v[f][3] = {"segmentation": _mask(cx=4 + 2 * f, cy=10),
                       "category": pri}
        got = tasks.select_key_objects_for_video(v)
        assert got[0] == pri

    def test_background_excluded(self):
        bg = next(iter(BACKGROUND_CATEGORIES))
        v = _video(cat_a=bg, move_a=5, cat_b="dog", move_b=0)
        # background moves but is excluded; dog never moves so has no
        # displacement entries -> empty or dog depending on rules
        got = tasks.select_key_objects_for_video(v)
        assert bg not in got

    def test_oversized_objects_filtered(self):
        big = np.ones((16, 16), np.uint8)  # 100% area
        v = {}
        for f in range(3):
            v[f] = {1: {"segmentation": big, "category": "wall-brick"
                        if "wall-brick" not in BACKGROUND_CATEGORIES
                        else "car"}}
        # area >= 50% and non-priority: filtered, but fallback keeps it
        got = tasks.select_key_objects_for_video(v)
        assert isinstance(got, list)

    def test_all_videos_masks_shape(self):
        masks = {0: _video(), 1: _video(cat_a="dog")}
        info, all_masks = tasks.select_key_objects_for_all_videos(
            masks, num_videos=3, n_frames=4, hw=16)
        assert all_masks.shape == (3, 4, 16, 16)
        assert info[0]["category"] == "car"
        assert info[1]["category"] == "dog"
        # the winner's mask is present in the tensor
        assert all_masks[0, 0].sum() > 0
        # video 2 has no masks -> zeros
        assert all_masks[2].sum() == 0

    def test_build_files(self, tmp_path):
        from PIL import Image

        mask_dir = tmp_path / "masks"
        mask_dir.mkdir()
        jd = {}
        for f in range(3):
            m = _mask(cx=4 + 3 * f)
            Image.fromarray(m * 255).save(mask_dir / f"mask_0_f{f}_1.png")
            jd[f"mask_0_f{f}"] = {"1": "car"}
        jpath = tmp_path / "ann.json"
        jpath.write_text(json.dumps(jd))
        tasks.build_key_object_files(str(mask_dir), str(jpath),
                                     str(tmp_path), "train", num_videos=2,
                                     n_frames=3, hw=16)
        info = json.loads((tmp_path / "key_objects_info_train.json"
                           ).read_text())
        assert info["0"]["category"] == "car"
        arr = np.load(tmp_path / "key_objects_masks_train.npz")["masks"]
        assert arr.shape[0] == 2


class TestCaptionEmbeds:
    def test_reference_pt_dialect(self, tmp_path):
        """gen_caption_embeds must emit the reference's exact artifact
        names (gen_GT_clip_embeds.py:25-29) so its consumers
        (gen_decoupled_outputs.py:223-224) interoperate."""
        import torch

        caps = [f"a caption {i}" for i in range(5)]
        out = tasks.gen_caption_embeds(
            caps, lambda b: np.full((len(b), 8), 0.5, np.float32),
            str(tmp_path), "test", batch_size=2)
        assert out.shape == (5, 8)
        got_caps = torch.load(tmp_path / "GT_test_caption_qwen.pt",
                              weights_only=False)
        # numpy string array, matching the reference's np.hstack dialect
        assert isinstance(got_caps, np.ndarray)
        assert got_caps.shape == (5,)
        assert list(got_caps) == caps
        emb = torch.load(tmp_path / "GT_test_caption_qwen_emb.pt",
                         weights_only=False)
        assert emb.dtype == torch.float32
        np.testing.assert_allclose(emb.numpy(), out)
