"""Training-throughput bench: stage-1 and stage-2 jitted train steps at
reference shapes on one TPU chip.

The inference bench (bench.py) covers the generative path; this measures
the trainable path — the stage-1 mixer contrastive step (batch 120,
reference train_neurons.sh:41-49) and the full stage-2 decoupler step
(batch 10, prior + seg/recon/caption/classifier heads + curriculum,
reference train_neurons.sh:54-66). Prints one JSON line per stage:
{"metric": "stage{1,2}_train_step", "value": ms, "unit": "ms/step",
 "steps_per_epoch_s": s} — an epoch = 4320 clips (reference
train_neurons.py:65).

Usage: python tools/train_bench.py [stage1] [stage2]  (default: both)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from neurons_tpu.utils import compile_cache  # noqa: E402
compile_cache.setup("tpu")
# the axon plugin re-pins JAX_PLATFORMS at interpreter startup; force the
# requested platform through jax.config (wins until backend init)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def bench_stage1(hidden: int = 4096):
    """NOTE: full-size stage 1 (hidden 4096 -> the 4096 x 425984
    backbone projection, 1.7B params) needs ~22 GB of f32 Adam state —
    it does NOT fit one 16 GB v5e chip; the reference trained it on
    large GPUs. On TPU it is the TP + ZeRO case: shard the projection
    over `model` and the moments over `data` (exactly what
    __graft_entry__.dryrun_multichip exercises). Pass hidden=2048/1024
    to bench the single-chip step at reduced width."""
    from neurons_tpu.config import BrainModelConfig, TrainConfig
    from neurons_tpu.training import train_brain as tb

    bcfg = BrainModelConfig(subjects=(1,), hidden_dim=hidden)
    tcfg = TrainConfig(batch_size=120, num_epochs=30, max_lr=5e-5)
    steps_per_epoch = 4320 // tcfg.batch_size
    model, state, tx = tb.init_stage1(bcfg, tcfg,
                                      steps_per_epoch=steps_per_epoch,
                                      key=jax.random.PRNGKey(0))
    step = tb.make_stage1_train_step(model, tx, tcfg)
    g = np.random.default_rng(0)
    B = tcfg.batch_size
    batch = {
        "voxel": jnp.asarray(g.normal(size=(B, 1, bcfg.voxel_counts[0]))
                             .astype(np.float32)),
        "clip_vision_target": jnp.asarray(
            g.normal(size=(B, bcfg.clip_seq_dim, bcfg.clip_emb_dim))
            .astype(np.float32)),
        "text_emb": jnp.asarray(
            g.normal(size=(B, bcfg.clip_txt_emb_dim)).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)
    state, m0 = step(state, key, batch["voxel"],
                     batch["clip_vision_target"], batch["text_emb"])
    float(m0["loss"])
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step(state, jax.random.fold_in(key, i),
                              batch["voxel"], batch["clip_vision_target"],
                              batch["text_emb"])
    # sync by materializing a scalar: block_until_ready on remote-tunnel
    # buffers returns early (measured 2 ms/step vs the true 65)
    float(metrics["loss"])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({"metric": f"stage1_train_step_h{hidden}",
                      "value": round(ms, 2), "unit": "ms/step",
                      "epoch_s": round(ms / 1e3 * steps_per_epoch, 2)}))


def bench_stage2():
    from neurons_tpu.config import (BrainModelConfig, DecouplerConfig,
                                    PriorConfig, TrainConfig)
    from neurons_tpu.models.gpt2 import GPT2Config
    from neurons_tpu.training import train_decoupler as td

    bcfg = BrainModelConfig(subjects=(1,))
    pcfg = PriorConfig()
    dcfg = DecouplerConfig()
    tcfg = TrainConfig(batch_size=10, num_epochs=50, max_lr=5e-5,
                       neurons_decoupler=True)
    gcfg = GPT2Config()  # GPT-2 small (the reference captioner)
    steps_per_epoch = 4320 // tcfg.batch_size
    bundle, state = td.init_stage2(bcfg, pcfg, dcfg, tcfg, gcfg,
                                   steps_per_epoch=steps_per_epoch,
                                   key=jax.random.PRNGKey(0))
    # the frozen 1.9B-param core is forward-only in stage 2: keep it in
    # bf16 (the reference's fp16 autocast held it in half precision too)
    # -- 3.9 GB of HBM back on a 16 GB chip
    params = dict(state.params)
    params["core"] = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params["core"])
    state = td.TrainState(params, state.opt_state, state.step)
    step = td.make_stage2_train_step(bundle, tcfg, dcfg, steps_per_epoch)
    g = np.random.default_rng(0)
    B, F = tcfg.batch_size, dcfg.n_frames
    batch = {
        "voxel": g.normal(size=(B, 1, bcfg.voxel_counts[0])).astype(np.float32),
        "clip_vision_target": g.normal(
            size=(B, bcfg.clip_seq_dim, bcfg.clip_emb_dim)).astype(np.float32),
        "clip_video_target": g.normal(
            size=(B, F, bcfg.clip_seq_dim, bcfg.clip_emb_dim)).astype(np.float32),
        "text_emb": g.normal(size=(B, bcfg.clip_txt_emb_dim)).astype(np.float32),
        "key_obj_text_embed": g.normal(
            size=(B, bcfg.clip_txt_emb_dim)).astype(np.float32),
        "key_obj_masks": (g.uniform(size=(B, F, 224, 224)) < 0.3
                          ).astype(np.float32),
        "cls_label": (g.uniform(size=(B, dcfg.num_classes)) < 0.2
                      ).astype(np.float32),
        "clip_tokens": g.integers(1, gcfg.vocab_size, size=(B, 60)
                                  ).astype(np.int32),
        "vae_latents": g.normal(size=(B, F, 4, 28, 28)).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    args = (jnp.asarray(0), jnp.asarray(0), jnp.asarray(0.005))
    state, m0 = step(state, key, batch, *args)
    float(m0["loss"])
    trace_dir = os.environ.get("TRAIN_PROFILE")
    if trace_dir:  # device-time attribution (tools/trace_analyze.py)
        with jax.profiler.trace(trace_dir):
            state, m = step(state, jax.random.fold_in(key, 99), batch,
                            *args)
            float(m["loss"])
        print(f"trace -> {trace_dir}", file=sys.stderr)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step(state, jax.random.fold_in(key, i), batch,
                              *args)
    float(metrics["loss"])  # true sync (see bench_stage1)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({"metric": "stage2_train_step", "value": round(ms, 2),
                      "unit": "ms/step",
                      "epoch_s": round(ms / 1e3 * steps_per_epoch, 2)}))


if __name__ == "__main__":
    which = sys.argv[1:] or ["stage1", "stage2"]
    hidden = next((int(a.split("=")[1]) for a in which
                   if a.startswith("hidden=")), 2048)
    if "stage1" in which:
        bench_stage1(hidden)
    if "stage2" in which:
        bench_stage2()
