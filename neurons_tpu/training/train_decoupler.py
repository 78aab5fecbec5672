"""Stage-2 trainer: diffusion prior + decoupler heads.

TPU-native re-design of the reference stage-2 loop (reference
train_neurons.py:287-651, `--neurons_decoupler` branch): one jitted step
computes all seven losses — prior DDPM MSE, temporal SoftCLIP, text NCE,
key-object Dice, multi-label BCE, caption CE, blurry-video L1 — under the
progressive sinusoidal curriculum (training/curriculum.py), and applies a
masked AdamW update that leaves the stage-1 core frozen
(reference :244-257 requires_grad flags -> optax mask).

TPU-first input contract (see data/cc2017.py): frozen-encoder products are
precomputed tables, not per-step frozen forward passes —
  clip_vision_target [B, 256, 1664]   frame-2 CLIP tokens (reference :400)
  clip_video_target  [B, F, 256,1664] per-frame CLIP tokens (reference :427)
  key_obj_text_embed [B, 1280]        class-name CLIP text embed (:457)
  vae_latents        [B, F, 4, h, w]  0.18215-scaled VAE mode (:498-499)
The epoch-dependent SoftCLIP temperature and curriculum weights enter as
traced scalars so the jit cache stays at one entry.
"""

from __future__ import annotations

import functools

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from neurons_tpu.config import (BrainModelConfig, DecouplerConfig,
                                PriorConfig, TrainConfig)
from neurons_tpu.diffusion.prior import PriorDiffusion
from neurons_tpu.models.gpt2 import GPT2Config
from neurons_tpu.models.neurons import NeuronsDecoupler
from neurons_tpu.training import losses
from neurons_tpu.training.curriculum import get_loss_weights
from neurons_tpu.training.optimizers import freeze_by_prefix, make_optimizer
from neurons_tpu.training.train_brain import TrainState


class Stage2Bundle(NamedTuple):
    model: NeuronsDecoupler
    diffusion: PriorDiffusion
    tx: Any


def init_stage2(bcfg: BrainModelConfig, pcfg: PriorConfig,
                dcfg: DecouplerConfig, tcfg: TrainConfig,
                gpt2_cfg: GPT2Config, steps_per_epoch: int, key: jax.Array,
                core_params: Any = None) -> Tuple[Stage2Bundle, TrainState]:
    model = NeuronsDecoupler(bcfg, pcfg, dcfg, gpt2_cfg)
    voxel = jnp.zeros((2, bcfg.seq_len, bcfg.voxel_counts[0]))
    tokens = jnp.zeros((2, 8), jnp.int32)
    params = model.init(key, voxel, tokens)["params"]
    if core_params is not None:
        # layer the stage-1 checkpoint under the ensemble (the reference's
        # strict=False load, train_neurons.py:219-221). Overlay, don't
        # replace: a partial warm-start (MindEye2 backbone only, or
        # backbone+clipproj without this run's ridge) keeps the freshly
        # initialised leaves for whatever it does not cover.
        from neurons_tpu.utils.checkpoint import restore_into
        params = dict(params)
        params["core"] = restore_into(params["core"], core_params)
    tx, _ = make_optimizer(tcfg, steps_per_epoch,
                           frozen_fn=freeze_by_prefix(("core",)))
    diffusion = PriorDiffusion.create(pcfg.timesteps, pcfg.cond_drop_prob)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    return Stage2Bundle(model, diffusion, tx), state


def init_stage2_abstract(bcfg: BrainModelConfig, pcfg: PriorConfig,
                         dcfg: DecouplerConfig, tcfg: TrainConfig,
                         gpt2_cfg: GPT2Config, steps_per_epoch: int,
                         key: jax.Array) -> Tuple[Stage2Bundle, TrainState]:
    """Shape-only `init_stage2`: the same bundle, but a TrainState of
    `jax.ShapeDtypeStruct`s. For AOT lowering/compile of the train step
    (layout/memory validation) without materializing the 2.2B-param
    ensemble — full-size compile checks on hosts that could never hold
    or step the real arrays."""
    model = NeuronsDecoupler(bcfg, pcfg, dcfg, gpt2_cfg)
    voxel = jax.ShapeDtypeStruct((2, bcfg.seq_len, bcfg.voxel_counts[0]),
                                 jnp.float32)
    tokens = jax.ShapeDtypeStruct((2, 8), jnp.int32)
    params = jax.eval_shape(
        lambda k, v, t: model.init(k, v, t)["params"], key, voxel, tokens)
    tx, _ = make_optimizer(tcfg, steps_per_epoch,
                           frozen_fn=freeze_by_prefix(("core",)))
    diffusion = PriorDiffusion.create(pcfg.timesteps, pcfg.cond_drop_prob)
    opt = jax.eval_shape(tx.init, params)
    state = TrainState(params, opt, jax.ShapeDtypeStruct((), jnp.int32))
    return Stage2Bundle(model, diffusion, tx), state


def _autocast_trees(enabled: bool):
    """bf16-autocast helpers: module forwards run bf16 (the reference
    trains under torch fp16 autocast, train_neurons.py:17,365), while
    master params, gradients, norms-of-losses and every loss term stay
    f32. bf16 has the f32 exponent, so no loss scaling is needed."""
    if not enabled:
        ident = lambda t: t
        return ident, ident

    def to_b16(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    def to_f32(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, t)
    return to_b16, to_f32


def stage2_loss(bundle: Stage2Bundle, params, key: jax.Array,
                batch: Dict[str, jax.Array], soft_temp: jax.Array,
                weights: jax.Array, tcfg: TrainConfig,
                dcfg: DecouplerConfig
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    model = bundle.model
    k_drop, k_prior, k_dropout = jax.random.split(key, 3)
    rngs = {"dropout": k_dropout}
    to_b16, to_f32 = _autocast_trees(tcfg.bf16_autocast)
    params = to_b16(params)

    def apply(method, *args, **kw):
        # bf16 in, f32 out: compute in half, keep every loss-side
        # consumer in full precision
        return to_f32(model.apply({"params": params}, *to_b16(args),
                                  method=method, rngs=rngs, **kw))

    voxel = batch["voxel"]
    b = voxel.shape[0]
    f = dcfg.n_frames

    # frozen core forward (params frozen via optax mask; reference :393-395)
    _, clip_vision_embeds, _ = apply(NeuronsDecoupler.encode, voxel)

    # ---- prior DDPM loss (reference :430) ----
    def net_apply(p, image_embed, times, brain_embed, **kw):
        return to_f32(model.apply(
            {"params": p}, to_b16(image_embed), times, to_b16(brain_embed),
            method=NeuronsDecoupler.prior_apply, rngs=rngs, **kw))

    from neurons_tpu.diffusion.prior import p_losses
    loss_prior, prior_out = p_losses(bundle.diffusion, net_apply, params,
                                     k_prior, batch["clip_vision_target"],
                                     clip_vision_embeds)

    # ---- motion embeddings (reference :434) ----
    motion = apply(NeuronsDecoupler.motion, prior_out)   # [B, F, N, C]

    # ---- temporal SoftCLIP (reference :438-446) ----
    video_t = batch["clip_video_target"]                 # [B, F, N, C]
    vt = losses.l2norm(video_t.reshape(b, f, -1)).reshape(b * f, -1)
    mt = losses.l2norm(motion.reshape(b, f, -1)).reshape(b * f, -1)
    loss_clip_vision = losses.soft_clip_loss(mt, vt, temp=soft_temp)

    # ---- text alignment (reference :450-453) ----
    pred_text = apply(NeuronsDecoupler.project_text, motion.mean(axis=1))
    pred_text_norm = losses.l2norm(pred_text)
    target_text_norm = losses.l2norm(
        batch["text_emb"].reshape(b, -1))
    loss_clip_txt = losses.mixco_nce(pred_text_norm, target_text_norm)

    # ---- key-object segmentation (reference :456-463) ----
    # remat the DecoderVideo head: its 64x64 up-path activations are the
    # stage-2 memory hot spot (B*F=60 x 64^2 x C per layer saved for the
    # backward); recomputing them trades ~10% step FLOPs for ~3 GB HBM
    def seg_decode_ckpt(params_, flat_motion_, text_, is_seg):
        return model.apply({"params": params_}, to_b16(flat_motion_),
                           to_b16(text_), flat_motion_.shape[0],
                           is_seg=is_seg,
                           method=NeuronsDecoupler.seg_decode, rngs=rngs,
                           deterministic=False)

    seg_decode_ckpt = jax.checkpoint(seg_decode_ckpt,
                                     static_argnums=(3,))

    flat_motion = motion.reshape(b * f, motion.shape[2], motion.shape[3])
    seg_logits = seg_decode_ckpt(params, flat_motion,
                                 batch["key_obj_text_embed"],
                                 True)                    # [(B F), 1, h, w]
    hw = seg_logits.shape[-2:]
    masks = batch["key_obj_masks"]                        # [B, F, H, W]
    masks = jax.image.resize(masks, masks.shape[:2] + hw, "nearest")
    masks = masks.reshape(b * f, 1, *hw)
    loss_seg = losses.dice_loss(seg_logits.astype(jnp.float32),
                                masks.astype(jnp.float32))

    # ---- multi-label classification (reference :481-482) ----
    cls_pred = apply(NeuronsDecoupler.classify,
                     motion.mean(axis=1).mean(axis=1))
    loss_cls = losses.bce_with_logits(cls_pred.astype(jnp.float32),
                                      batch["cls_label"])

    # ---- caption CE (reference :486-494) ----
    tokens = batch["clip_tokens"]
    logits = apply(NeuronsDecoupler.caption_logits,
                   pred_text_norm.astype(jnp.float32), tokens)
    logits = logits[:, :-1]                               # drop last position
    loss_text = losses.cross_entropy_ignore(logits, tokens)
    valid = tokens > 0
    acc_text = ((jnp.argmax(logits, -1).reshape(-1) == tokens.reshape(-1))
                & valid.reshape(-1)).sum() / jnp.maximum(valid.sum(), 1)

    # ---- blurry video recon (reference :497-504) ----
    vae_lat = batch["vae_latents"]                        # [B, F, 4, h, w]
    vae_lat = vae_lat.reshape(b * f, *vae_lat.shape[2:])
    rec = seg_decode_ckpt(params, flat_motion, pred_text,
                          False)                          # [(B F), 4, h', w']
    rec = jax.image.resize(rec.astype(jnp.float32),
                           rec.shape[:2] + vae_lat.shape[-2:], "nearest")
    loss_recon = losses.l1_loss(rec, vae_lat)

    # ---- progressive weights (reference :507-513) ----
    loss = (loss_prior * tcfg.prior_scale + loss_clip_vision + loss_clip_txt
            + loss_seg * weights[0] + loss_cls * weights[1]
            + loss_text * weights[2] + loss_recon * weights[3])
    metrics = {"loss": loss, "loss_prior": loss_prior,
               "loss_clip_vision": loss_clip_vision,
               "loss_clip_txt": loss_clip_txt,
               "loss_key_obj_seg": loss_seg, "loss_multi_cls": loss_cls,
               "loss_text_gen": loss_text, "loss_recon_video": loss_recon,
               "train_acc_text_gen": acc_text}
    return loss, metrics


def make_stage2_seg_panel_fn(bundle: Stage2Bundle, dcfg: DecouplerConfig):
    """Periodic seg-mask visualization panels (the reference's wandb image
    logging, train_neurons.py:464-477): predicted masks next to GT for a
    few samples of the current batch, from the same one-step prior x0
    signal the seg head trains on."""
    model = bundle.model

    @jax.jit
    def panel(params, key, batch):
        voxel = batch["voxel"]
        b, f = voxel.shape[0], dcfg.n_frames
        _, clip_vision, _ = model.apply({"params": params}, voxel,
                                        method=NeuronsDecoupler.encode)

        def net_apply(p, image_embed, times, brain_embed, **kw):
            return model.apply({"params": p}, image_embed, times,
                               brain_embed,
                               method=NeuronsDecoupler.prior_apply, **kw)

        from neurons_tpu.diffusion.prior import p_losses
        _, prior_out = p_losses(bundle.diffusion, net_apply, params, key,
                                batch["clip_vision_target"], clip_vision)
        motion = model.apply({"params": params}, prior_out,
                             method=NeuronsDecoupler.motion)
        flat = motion.reshape(b * f, motion.shape[2], motion.shape[3])
        seg = model.apply({"params": params}, flat,
                          batch["key_obj_text_embed"], b * f,
                          method=NeuronsDecoupler.seg_decode)
        pred = jax.nn.sigmoid(seg.astype(jnp.float32))  # [(B F), 1, h, w]
        hw = pred.shape[-2:]
        gt = jax.image.resize(batch["key_obj_masks"],
                              batch["key_obj_masks"].shape[:2] + hw,
                              "nearest").reshape(b * f, 1, *hw)
        return pred[:, 0], gt[:, 0]                     # [(B F), h, w]

    return panel


def make_stage2_train_step(bundle: Stage2Bundle, tcfg: TrainConfig,
                           dcfg: DecouplerConfig, steps_per_epoch: int):
    # donate the state (see train_brain.make_stage1_train_step): avoids
    # double-buffering the 9.4 GB param tree + 3.3 GB Adam moments
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, key: jax.Array,
                   batch: Dict[str, jax.Array], epoch: jax.Array,
                   iteration: jax.Array, soft_temp: jax.Array):
        weights = get_loss_weights(tcfg.num_epochs, epoch, iteration,
                                   steps_per_epoch)

        # Differentiate ONLY the trainable subtree: the frozen stage-1
        # core is 1.7B params (the 4096 x 425984 backbone projection) —
        # value_and_grad over the full tree materialized ~7 GB of
        # gradients the masked optimizer then discarded, which alone
        # OOM'd a 16 GB v5e chip (measured via tools/train_bench.py).
        core = jax.lax.stop_gradient(state.params["core"])
        trainable = {k: v for k, v in state.params.items() if k != "core"}

        def loss_fn(tp):
            return stage2_loss(bundle, dict(tp, core=core), key, batch,
                               soft_temp, weights, tcfg, dcfg)

        (_, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        # zero grads for the frozen label (set_to_zero ignores them; the
        # zeros fold away in XLA)
        grads = dict(g, core=jax.tree_util.tree_map(
            jnp.zeros_like, state.params["core"]))
        updates, opt_state = bundle.tx.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
