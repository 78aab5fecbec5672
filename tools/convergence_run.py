"""Training-convergence evidence run (VERDICT round-1 item 5).

Runs multi-epoch stage-1 and stage-2 training on STRUCTURED synthetic
data (cc2017.structured_synthetic_split: every modality a fixed linear
readout of a shared per-clip latent, so the tasks are genuinely
learnable), then a kill-and-resume equivalence check, and writes
CONVERGENCE_r02.json with the loss/metric curves:

  stage1: per-epoch mean mixco/NCE loss + retrieval fwd/bwd/text
          percent-correct on the held-out split (the reference's only
          quality control, train_neurons.py:551-626)
  stage2: per-epoch mean total loss + per-component losses
  resume: max |param delta| between an N-epoch straight run and a
          k-epoch run -> checkpoint -> resume -> N-epoch run

Usage: python tools/convergence_run.py  (forces the CPU backend; ~10 min
on one core at the default sizes).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from neurons_tpu.utils import compile_cache  # noqa: E402
compile_cache.setup("cpu")

import numpy as np

from neurons_tpu.config import (BrainModelConfig, DecouplerConfig, MeshConfig,
                                PriorConfig, TrainConfig)
from neurons_tpu.data import cc2017
from neurons_tpu.models.gpt2 import tiny_gpt2_config
from neurons_tpu.parallel import create_mesh
from neurons_tpu.training.loop import (run_stage1, run_stage2,
                                       structured_stage2_batch_builder)

N_VOX = 13447     # subject-1 voxel count (config.SUBJECT_VOXELS)
SEQ, EMB, TXT = 16, 64, 24


def read_jsonl(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def stage1_curves(tmp, epochs=8):
    bcfg = BrainModelConfig(hidden_dim=256, n_blocks=2, clip_seq_dim=SEQ,
                            clip_emb_dim=EMB, clip_txt_emb_dim=TXT,
                            subjects=(1,))
    tcfg = TrainConfig(batch_size=16, num_epochs=epochs, max_lr=3e-4,
                       mixup_pct=0.33, num_train_samples=256,
                       num_test_samples=64, ckpt_saving=True, seed=0)
    mesh = create_mesh(MeshConfig(data=-1))
    tr, ct_tr, _ = cc2017.structured_synthetic_split(
        256, N_VOX, seq=SEQ, emb=EMB, txt_dim=TXT, seed=1)
    te, ct_te, _ = cc2017.structured_synthetic_split(
        64, N_VOX, seq=SEQ, emb=EMB, txt_dim=TXT, seed=2, train=False)
    ckpt = os.path.join(tmp, "s1")
    run_stage1(bcfg, tcfg, mesh, tr, te, ct_tr, ct_te, ckpt_dir=ckpt)
    rows = [r for r in read_jsonl(os.path.join(ckpt, "metrics.jsonl"))
            if "test/fwd_pct" in r]
    return {
        "epochs": [r["epoch"] for r in rows],
        "train_loss": [round(r["train/mean_loss"], 4) for r in rows],
        "fwd_pct": [round(r["test/fwd_pct"], 4) for r in rows],
        "bwd_pct": [round(r["test/bwd_pct"], 4) for r in rows],
        "text_pct": [round(r["test/text_pct"], 4) for r in rows],
    }


def stage2_curves(tmp, epochs=6):
    bcfg = BrainModelConfig(hidden_dim=256, n_blocks=2, clip_seq_dim=SEQ,
                            clip_emb_dim=EMB, clip_txt_emb_dim=TXT,
                            subjects=(1,))
    pcfg = PriorConfig(dim=EMB, depth=2, dim_head=16, heads=4,
                       num_tokens=SEQ, timesteps=20)
    dcfg = DecouplerConfig(n_frames=2, num_classes=51, clip_emb_dim=EMB,
                           clip_txt_emb_dim=TXT,
                           decoder_block_out_channels=(8, 8, 8))
    gcfg = tiny_gpt2_config()
    tcfg = TrainConfig(batch_size=8, num_epochs=epochs, max_lr=3e-4,
                       neurons_decoupler=True, n_frames=2,
                       num_train_samples=64, ckpt_saving=False, seed=0)
    mesh = create_mesh(MeshConfig(data=-1))
    tr, ct_tr, aux = cc2017.structured_synthetic_split(
        64, N_VOX, seq=SEQ, emb=EMB, txt_dim=TXT, n_frames=2, seed=3)
    builder = structured_stage2_batch_builder(ct_tr, aux, tr, dcfg,
                                              gcfg.vocab_size)
    ckpt = os.path.join(tmp, "s2")
    run_stage2(bcfg, pcfg, dcfg, tcfg, gcfg, mesh, tr, builder,
               ckpt_dir=ckpt, image_log_every=0)
    rows = read_jsonl(os.path.join(ckpt, "metrics.jsonl"))
    return {"epochs": [r["epoch"] for r in rows],
            "train_loss": [round(r["train/mean_loss"], 4) for r in rows]}


def resume_equivalence(tmp, total=4, split_at=2):
    """Straight N-epoch run vs run-k/kill/resume-to-N: identical params
    (the reference's --resume_from_ckpt contract,
    train_neurons.py:342-352)."""
    bcfg = BrainModelConfig(hidden_dim=128, n_blocks=1, clip_seq_dim=8,
                            clip_emb_dim=32, clip_txt_emb_dim=TXT,
                            subjects=(1,))
    mesh = create_mesh(MeshConfig(data=-1))
    tr, ct_tr, _ = cc2017.structured_synthetic_split(
        64, N_VOX, seq=8, emb=32, txt_dim=TXT, seed=4)
    te, ct_te, _ = cc2017.structured_synthetic_split(
        32, N_VOX, seq=8, emb=32, txt_dim=TXT, seed=5, train=False)

    def mk_tcfg(n):
        return TrainConfig(batch_size=16, num_epochs=n, max_lr=3e-4,
                           mixup_pct=0.0, num_train_samples=64,
                           num_test_samples=32, ckpt_saving=True, seed=0)

    d_straight = os.path.join(tmp, "straight")
    st_a = run_stage1(bcfg, mk_tcfg(total), mesh, tr, te, ct_tr, ct_te,
                      ckpt_dir=d_straight)
    d_resume = os.path.join(tmp, "resumed")
    # "kill" after split_at epochs (same num_epochs config, so the LR
    # schedule horizon matches the straight run), then resume to the end
    run_stage1(bcfg, mk_tcfg(total), mesh, tr, te, ct_tr, ct_te,
               ckpt_dir=d_resume, stop_after_epochs=split_at)
    st_b = run_stage1(bcfg, mk_tcfg(total), mesh, tr, te, ct_tr, ct_te,
                      ckpt_dir=d_resume, resume=True)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float64)
                                         - np.asarray(b, np.float64)))),
        st_a.params, st_b.params)
    return float(max(jax.tree_util.tree_leaves(deltas)))


def main():
    tmp = tempfile.mkdtemp(prefix="convergence_")
    out = {"generated_by": "tools/convergence_run.py",
           "data": "structured synthetic (linear shared-latent readouts), "
                   f"{N_VOX} voxels"}
    t0 = time.time()
    out["stage1"] = stage1_curves(tmp)
    out["stage2"] = stage2_curves(tmp)
    out["resume_max_param_delta"] = resume_equivalence(tmp)
    out["wallclock_s"] = round(time.time() - t0, 1)

    s1 = out["stage1"]
    chance = 1.0 / 64
    out["checks"] = {
        "stage1_loss_falls": s1["train_loss"][-1] < s1["train_loss"][0],
        "stage1_retrieval_improves":
            s1["fwd_pct"][-1] > max(4 * chance, s1["fwd_pct"][0]),
        "stage2_loss_falls":
            out["stage2"]["train_loss"][-1] < out["stage2"]["train_loss"][0],
        "resume_exact": out["resume_max_param_delta"] < 1e-5,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONVERGENCE_r02.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["checks"]))
    print(f"-> {path}")
    shutil.rmtree(tmp, ignore_errors=True)
    if not all(out["checks"].values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
