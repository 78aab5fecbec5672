"""MetricLogger image panels (the reference's periodic wandb seg-mask
visualizations, train_neurons.py:464-477) — direct unit test plus the
stage-2 loop wiring."""

import glob
import os

import numpy as np

from neurons_tpu.utils.metrics_log import MetricLogger
import pytest


def test_log_images_writes_pngs(tmp_path):
    logger = MetricLogger(log_dir=str(tmp_path))
    g = np.random.default_rng(0)
    logger.log_images({"seg_pred": g.uniform(size=(4, 8, 8)),   # batch
                       "rgb": g.uniform(size=(8, 8, 3)),        # HWC
                       "mask": g.uniform(size=(8, 8, 1))},      # HW1
                      step=7)
    logger.close()
    files = sorted(os.listdir(tmp_path / "images"))
    assert files == ["step7_mask.png", "step7_rgb.png",
                     "step7_seg_pred.png"]
    import imageio

    tiled = imageio.imread(tmp_path / "images" / "step7_seg_pred.png")
    assert tiled.shape[:2] == (8, 32)  # batch tiled along width


@pytest.mark.slow
def test_stage2_loop_emits_seg_panels(tmp_path, mesh8):
    from neurons_tpu.config import (BrainModelConfig, DecouplerConfig,
                                    PriorConfig, TrainConfig)
    from neurons_tpu.data import cc2017
    from neurons_tpu.models.gpt2 import tiny_gpt2_config
    from neurons_tpu.training.loop import (run_stage2,
                                           synthetic_stage2_batch_builder)

    bcfg = BrainModelConfig(hidden_dim=32, n_blocks=1, clip_seq_dim=16,
                            clip_emb_dim=32, clip_txt_emb_dim=24,
                            subjects=(1,))
    pcfg = PriorConfig(dim=32, depth=1, dim_head=8, heads=4, num_tokens=16,
                       timesteps=5)
    dcfg = DecouplerConfig(n_frames=2, num_classes=51, clip_emb_dim=32,
                           clip_txt_emb_dim=24,
                           decoder_block_out_channels=(8, 8, 8))
    gcfg = tiny_gpt2_config()
    tcfg = TrainConfig(batch_size=8, num_epochs=1, max_lr=1e-4,
                       neurons_decoupler=True, n_frames=2,
                       num_train_samples=8, ckpt_saving=False)
    split = cc2017.synthetic_split(n=8, n_voxels=bcfg.voxel_counts[0],
                                   n_frames=2, img=16,
                                   txt_dim=bcfg.clip_txt_emb_dim,
                                   n_classes=51, seed=0, train=True)
    builder = synthetic_stage2_batch_builder(bcfg, dcfg, gcfg.vocab_size, 0)
    run_stage2(bcfg, pcfg, dcfg, tcfg, gcfg, mesh8, split, builder,
               ckpt_dir=str(tmp_path), image_log_every=1)
    pngs = glob.glob(str(tmp_path / "images" / "*seg_pred.png"))
    assert pngs, "stage-2 loop wrote no seg panels"
    assert glob.glob(str(tmp_path / "images" / "*seg_gt.png"))
    assert os.path.exists(tmp_path / "metrics.jsonl")
