"""The real CC2017/NEURONS on-disk contract, exercised end-to-end on a
fixture that mirrors the released HF layout exactly (reference
download_dataset.py:1-15 pulls gongzx/cc2017_dataset wholesale plus
masks/* and qwen_annotation/* from the McGregorW/NEURONS *model* repo;
train_neurons.py:79-110 then loads the files by these literal names).
Covers: `download()` call fidelity (mocked hub), `load_split` on the
real file names, and the MindEye2/coco warm-start layering
(train_neurons.py:208-241)."""

import json
import os
import sys
import types

import jax
import numpy as np
import pytest
import torch

from neurons_tpu.config import BrainModelConfig, TrainConfig
from neurons_tpu.data import cc2017
from neurons_tpu.data.categories import CLS_DICT

N, NT, NV, F, IMG, TXT = 8, 4, 120, 6, 32, 24


@pytest.fixture(scope="module")
def hf_root(tmp_path_factory):
    """Tiny on-disk mirror of the downloaded dataset tree."""
    root = tmp_path_factory.mktemp("cc2017_dataset")
    g = np.random.default_rng(0)
    name_by_id = CLS_DICT

    for tag, n in (("train", N), ("test", NT)):
        torch.save(torch.tensor(g.normal(size=(n, 2, NV)), dtype=torch.float64),
                   root / f"subj01_{tag}_fmri.pt")
        torch.save(torch.tensor(
            g.uniform(size=(n, F, 3, IMG, IMG)).astype(np.float32)),
            root / f"GT_{tag}_3fps.pt")
        torch.save([f"a {name_by_id[i % 51]} in a scene" for i in range(n)],
                   root / f"GT_{tag}_caption.pt")
        torch.save(torch.tensor(g.normal(size=(n, TXT)), dtype=torch.float64),
                   root / f"GT_{tag}_caption_emb.pt")

    qa = root / "qwen_annotation"
    qa.mkdir()
    for tag, n in (("train", N), ("test", NT)):
        json.dump([{"category_id": [int(i % 51), int((i + 3) % 51)]}
                   for i in range(n)],
                  open(qa / f"qwen_{tag}_caption_tag_category_id.json", "w"))

    masks = root / "masks"
    masks.mkdir()
    for tag, n, stem in (("train", N, "key_objects_masks_train"),
                         ("test", NT, "key_objects_masks_qwen_test")):
        torch.save(torch.tensor(
            (g.uniform(size=(n, F, IMG, IMG)) < 0.3).astype(np.float32)),
            masks / f"{stem}.pt")
        info_stem = stem.replace("masks", "info")
        json.dump({str(i): {"category": CLS_DICT[(i + 1) % 51]}
                   for i in range(n)},
                  open(masks / f"{info_stem}.json", "w"))
    return root


def test_load_split_train(hf_root):
    s = cc2017.load_split(str(hf_root), subj=1, train=True)
    assert s.voxel.shape == (N, 2, NV) and s.voxel.dtype == np.float32
    assert s.images.shape == (N, F, 3, IMG, IMG)
    assert s.text_emb.shape == (N, TXT)
    assert s.clip_tokens.shape == (N, cc2017.MAX_TOKENS)
    assert s.clip_tokens.max() > 0  # real BPE ids, not padding
    assert s.cls_label.shape == (N, 51)
    # multi-hot from the qwen annotation: row i has ids {i%51, (i+3)%51}
    assert s.cls_label[1, 1] == 1.0 and s.cls_label[1, 4] == 1.0
    assert s.cls_label.sum(axis=1).max() <= 2
    assert s.key_obj_masks.shape == (N, F, IMG, IMG)
    assert set(np.unique(s.key_obj_masks)) <= {0.0, 1.0}
    # info category "(i+1) % 51" mapped back through CLS_DICT
    assert s.key_obj_cls[3] == 4


def test_load_split_test_means_repeats(hf_root):
    s = cc2017.load_split(str(hf_root), subj=1, train=False)
    raw = torch.load(hf_root / "subj01_test_fmri.pt",
                     weights_only=True).float().numpy()
    assert s.voxel.shape == (NT, 1, NV)
    np.testing.assert_allclose(s.voxel[:, 0], raw.mean(axis=1), rtol=1e-6)
    # dedicated qwen TEST masks picked up (gen_decoupled_outputs.py:228-231)
    assert s.key_obj_masks.shape == (NT, F, IMG, IMG)


def test_download_call_fidelity(monkeypatch, tmp_path):
    """download() must mirror the reference's two snapshot_download calls:
    dataset repo pulled whole; NEURONS *model* repo restricted to
    masks/* + qwen_annotation/* (else the >60 GB EXP dump comes too)."""
    calls = []
    fake = types.ModuleType("huggingface_hub")
    fake.snapshot_download = lambda **kw: calls.append(kw)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    from neurons_tpu.data.download import download

    download(str(tmp_path / "ds"))
    assert calls[0]["repo_id"] == "gongzx/cc2017_dataset"
    assert calls[0]["repo_type"] == "dataset"
    assert "allow_patterns" not in calls[0]
    assert calls[1]["repo_id"] == "McGregorW/NEURONS"
    assert calls[1]["repo_type"] == "model"
    assert calls[1]["allow_patterns"] == ["masks/*", "qwen_annotation/*"]


# ---------------------------------------------------------------------------
# warm-start layering (train_neurons.py:208-241)
# ---------------------------------------------------------------------------

BCFG = BrainModelConfig(hidden_dim=16, n_blocks=2, seq_len=1, clip_seq_dim=4,
                        clip_emb_dim=8, clip_txt_emb_dim=6, subjects=(1,))


def _mindeye_sd():
    """MindEye2 last.pth-style state dict: backbone.* plus foreign heads
    that strict=False must ignore."""
    from tests.test_ensemble_import import TorchMixerBackbone

    tm = TorchMixerBackbone(BCFG.hidden_dim, BCFG.seq_len, BCFG.n_blocks,
                            BCFG.clip_seq_dim * BCFG.clip_emb_dim,
                            BCFG.clip_emb_dim)
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    sd["ridge.linears.0.weight"] = torch.randn(BCFG.hidden_dim, 999)
    sd["diffusion_prior.net.foo"] = torch.randn(3)
    return sd


def test_warm_start_layering(tmp_path):
    from neurons_tpu.interop.torch_import import (import_coco_clipproj,
                                                  import_mindeye_backbone)
    from neurons_tpu.training import train_brain
    from neurons_tpu.utils.checkpoint import merge_overlays, restore_into

    sd = _mindeye_sd()
    backbone, unused = import_mindeye_backbone(sd, n_blocks=BCFG.n_blocks)
    # foreign heads are reported, not imported
    assert "ridge.linears.0.weight" in unused
    assert "diffusion_prior.net.foo" in unused
    coco = {"proj": torch.randn(BCFG.clip_emb_dim, BCFG.clip_txt_emb_dim)}
    proj, _ = import_coco_clipproj(coco)

    tcfg = TrainConfig(batch_size=2, num_epochs=1)
    _, state, _ = train_brain.init_stage1(BCFG, tcfg, 1,
                                          jax.random.PRNGKey(0))
    ridge_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["ridge"])[0])
    overlay = merge_overlays(backbone, {"clipproj": proj})
    params = restore_into(state.params, overlay)
    np.testing.assert_allclose(
        np.asarray(params["clipproj"]["proj"]), coco["proj"].numpy(),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["backbone_linear"]["kernel"]),
        sd["backbone.backbone_linear.weight"].numpy().T, rtol=1e-6)
    # ridge untouched: the reference re-inits it fresh after the load
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params["ridge"])[0]),
        ridge_before)


def test_stage2_partial_core_overlay():
    """init_stage2 must OVERLAY core_params (strict=False), keeping fresh
    leaves where the warm start is partial (backbone-only)."""
    from neurons_tpu.config import DecouplerConfig, PriorConfig
    from neurons_tpu.interop.torch_import import import_mindeye_backbone
    from neurons_tpu.models.gpt2 import tiny_gpt2_config
    from neurons_tpu.training import train_decoupler

    sd = _mindeye_sd()
    backbone, _ = import_mindeye_backbone(sd, n_blocks=BCFG.n_blocks)
    pcfg = PriorConfig(dim=8, depth=1, dim_head=4, heads=2, num_tokens=4,
                       timesteps=5)
    dcfg = DecouplerConfig(n_frames=2, num_classes=7, clip_emb_dim=8,
                           clip_txt_emb_dim=6,
                           decoder_block_out_channels=(4, 8, 8))
    tcfg = TrainConfig(batch_size=2, num_epochs=1)
    _, state = train_decoupler.init_stage2(
        BCFG, pcfg, dcfg, tcfg, tiny_gpt2_config(), 1,
        jax.random.PRNGKey(0), core_params=backbone)
    np.testing.assert_allclose(
        np.asarray(state.params["core"]["backbone"]["backbone_linear"]
                   ["kernel"]),
        sd["backbone.backbone_linear.weight"].numpy().T, rtol=1e-6)
    # ridge/clipproj stay at their fresh init (present, finite)
    assert np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(state.params["core"]["ridge"])[0])).all()
    assert np.isfinite(
        np.asarray(state.params["core"]["clipproj"]["proj"])).all()
