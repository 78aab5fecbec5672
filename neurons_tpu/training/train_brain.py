"""Stage-1 trainer: brain model contrastive alignment to CLIP space.

TPU-native re-design of the reference stage-1 loop (reference
train_neurons.py:287-651, `--no-neurons_decoupler` branch): the whole step —
BiMixCo voxel mixup, ridge/backbone/clipproj forward, bidirectional InfoNCE
against frozen CLIP image tokens and caption embeddings, AdamW update with
OneCycle LR — is ONE jitted function over a GSPMD-sharded batch. Gradients
all-reduce over the `data` mesh axis automatically (no DDP/NCCL); the
frozen clipproj is an optax mask, not a requires_grad flag.

Precision policy: params fp32, matmuls bf16-accumulate-fp32 via
`jax.default_matmul_precision` at the call site (replacing the reference's
fp16 autocast + GradScaler, which TPU does not need).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurons_tpu.config import BrainModelConfig, TrainConfig
from neurons_tpu.models.neurons import NeuronsCore
from neurons_tpu.training import losses
from neurons_tpu.training.optimizers import freeze_by_prefix, make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_stage1(cfg: BrainModelConfig, tcfg: TrainConfig,
                steps_per_epoch: int, key: jax.Array
                ) -> Tuple[NeuronsCore, TrainState, Any]:
    model = NeuronsCore(cfg)
    voxel = jnp.zeros((2, cfg.seq_len, cfg.voxel_counts[0]))
    params = model.init(key, voxel)["params"]
    tx, _ = make_optimizer(tcfg, steps_per_epoch,
                           frozen_fn=freeze_by_prefix(("clipproj",)))
    opt_state = tx.init(params)
    return model, TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def stage1_loss(model: NeuronsCore, params, key: jax.Array,
                voxel: jax.Array, clip_target: jax.Array,
                text_target: jax.Array, mixco_temp: float,
                use_mixco: bool, bf16_autocast: bool = False
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Reference train_neurons.py:389-422. After `mixup_pct` of training the
    reference's MindEye recipe switches from BiMixCo to SoftCLIP; stage 1
    runs with mixup_pct=1.0 so BiMixCo is always on (train_neurons.sh:44),
    but both paths are supported."""
    k_mix, k_drop = jax.random.split(key)
    state = None
    if use_mixco:
        voxel, state = losses.mixco(k_mix, voxel)
    if bf16_autocast:
        # bf16 forward (reference fp16 autocast, train_neurons.py:365);
        # master params/grads and every loss term stay f32
        from neurons_tpu.training.train_decoupler import _autocast_trees
        to_b16, to_f32 = _autocast_trees(True)
        params, voxel = to_b16(params), to_b16(voxel)
    _, clip_vision, clip_text = model.apply(
        {"params": params}, voxel, deterministic=False,
        rngs={"dropout": k_drop})
    clip_vision = clip_vision.astype(jnp.float32)
    clip_text = clip_text.astype(jnp.float32)

    v_norm = losses.l2norm(clip_vision.reshape(clip_vision.shape[0], -1))
    t_norm = losses.l2norm(clip_target.reshape(clip_target.shape[0], -1))
    if use_mixco:
        loss_vision = losses.mixco_nce(v_norm, t_norm, temp=mixco_temp,
                                       state=state)
    else:
        loss_vision = losses.soft_clip_loss(v_norm, t_norm)

    ct_norm = losses.l2norm(clip_text)
    tt_norm = losses.l2norm(text_target.reshape(text_target.shape[0], -1))
    loss_text = losses.mixco_nce(ct_norm, tt_norm) * 0.25

    loss = loss_vision + loss_text
    return loss, {"loss": loss, "loss_clip_vision": loss_vision,
                  "loss_clip_txt": loss_text}


def make_stage1_train_step(model: NeuronsCore, tx, tcfg: TrainConfig):
    # donate the state: without donation XLA double-buffers params +
    # Adam moments across the step (2x ~21 GB for the 1.7B-param stage-1
    # ensemble — measured OOM on a 16 GB v5e via tools/train_bench.py)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, key: jax.Array, voxel: jax.Array,
                   clip_target: jax.Array, text_target: jax.Array):
        def loss_fn(params):
            return stage1_loss(model, params, key, voxel, clip_target,
                               text_target, tcfg.mixco_temp, use_mixco=True,
                               bf16_autocast=tcfg.bf16_autocast)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_stage1_eval_step(model: NeuronsCore):
    """Epoch-end retrieval eval (reference train_neurons.py:557-626):
    fwd/bwd top-1 retrieval of CLIP targets within the batch, and top-5
    caption retrieval through clipproj."""

    @jax.jit
    def eval_step(params, voxel, clip_target, text_target):
        _, clip_vision, clip_text = model.apply({"params": params}, voxel)
        v = losses.l2norm(clip_vision.reshape(clip_vision.shape[0], -1))
        t = losses.l2norm(clip_target.reshape(clip_target.shape[0], -1))
        labels = jnp.arange(v.shape[0])
        fwd = losses.topk_accuracy(
            losses.batchwise_cosine_similarity(v, t), labels, k=1)
        bwd = losses.topk_accuracy(
            losses.batchwise_cosine_similarity(t, v), labels, k=1)
        ct = losses.l2norm(clip_text)
        tt = losses.l2norm(text_target.reshape(text_target.shape[0], -1))
        txt = losses.topk_accuracy(
            losses.batchwise_cosine_similarity(ct, tt), labels, k=5)
        return {"test_fwd_percent_correct": fwd,
                "test_bwd_percent_correct": bwd,
                "text_fwd_percent_correct": txt}

    return eval_step


def select_stage1_inputs(batch: Dict[str, np.ndarray], epoch: int,
                         clip_targets: Optional[np.ndarray] = None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side epoch-parity frame/repeat selection (reference
    train_neurons.py:372-373): voxel repeat epoch%2, GT frame 2 + epoch%2.
    `clip_targets` is the precomputed [N, n_frames, 256, 1664] CLIP table
    indexed at the same frame; when absent, callers must embed
    batch images on the fly."""
    r = epoch % 2
    voxel = batch["voxel"][:, r][:, None]  # [B, 1, nv]
    if clip_targets is not None:
        # f32 cast here so the table can live on disk in f16 (a full
        # 4320x6x256x1664 table is 21 GB f16 vs 43 GB f32; the builders
        # stream it mmap'ed — see loop.table_stage2_batch_builder);
        # frame clamps to the table depth for short tiny-smoke tables
        frame = min(2 + r, clip_targets.shape[1] - 1)
        target = np.asarray(clip_targets[batch["index"], frame],
                            np.float32)
        return voxel, target
    return voxel, batch["images"][:, 2 + r]
