"""Full training loops for stages 1 and 2 (epochs, eval, checkpointing).

The orchestration layer over the jitted steps (reference
train_neurons.py:287-651 `train`): epoch loop with host-side batch
assembly, epoch-parity frame selection, epoch-end retrieval eval, best-
metric + last checkpointing via Orbax. Rank gating is
`jax.process_index() == 0` (the reference's accelerator.is_main_process);
the barrier the reference needs (:642) is implicit — every process runs the
same jitted graph, and Orbax saves synchronize internally.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurons_tpu.config import (BrainModelConfig, DecouplerConfig,
                                PipelineConfig, PriorConfig, TrainConfig)
from neurons_tpu.data import cc2017
from neurons_tpu.parallel import prefetch_to_device, shard_batch
from neurons_tpu.training import losses, train_brain, train_decoupler
from neurons_tpu.utils import checkpoint as ckpt_lib
from neurons_tpu.utils.prng import epoch_key, root_key


def _log(msg: str):
    if jax.process_index() == 0:
        print(msg, flush=True)


def _eval_targets(clip_targets_test, sl: slice):
    """Epoch-end retrieval-eval CLIP targets for a test chunk.

    Accepts the precomputed table (ndarray/mmap, the production input
    path) or a CALLABLE `sl -> [b, seq, emb]` device array — the
    wire-light path for harness environments where the host<->TPU
    tunnel sustains only ~25 MB/s and streaming the 170 MB f32 chunk
    per eval batch would cost more than the eval itself
    (tools/train_production.py device-materialized builder)."""
    if callable(clip_targets_test):
        return clip_targets_test(sl)
    return jnp.asarray(np.asarray(
        clip_targets_test[sl, min(2, clip_targets_test.shape[1] - 1)],
        np.float32))


def _sans_core(params):
    """Mid-run checkpoint payload: the TRAINED subtree only. The frozen
    stage-1 core inside `state.params` is immutable during stage 2 and
    is guaranteed its own on-disk artifact: `run_stage2` writes a
    one-time `brain_model_core` checkpoint into the same ckpt_dir
    before the first epoch, so a run killed before the final full-tree
    `_last` still leaves a complete consumable pair (the CLI overlays
    `brain_model_core` when it finds a sans-core `_last`,
    cli._load_decoupler_params). Re-writing the multi-GB core on every
    improving epoch would make checkpoint cost scale with the frozen
    model instead of the trained one. The END-of-training save keeps
    the full tree — the reference's single-file consumption contract
    (train_neurons.py:48-61), so downstream consumers are unchanged."""
    if isinstance(params, dict) and "core" in params:
        return {k: v for k, v in params.items() if k != "core"}
    return params


#: Peak-residency accounting of the last `_restore_state` call, for the
#: regression test that pins the restore memory contract
#: (tests/test_train_production.py): `peak_extra_bytes` is the maximum
#: device bytes held ABOVE the init state at any point during restore —
#: with free-before-put it stays ~one leaf, not a second full state.
LAST_RESTORE_STATS: Dict[str, int] = {}


class _RestoreAccounting:
    def __init__(self):
        self.extra = 0
        self.peak_extra = 0
        self.freed_bytes = 0
        self.put_bytes = 0

    def freed(self, n: int):
        self.extra -= n
        self.freed_bytes += n

    def put(self, n: int):
        self.extra += n
        self.put_bytes += n
        self.peak_extra = max(self.peak_extra, self.extra)


def _delete_device_tree(tree, acct: _RestoreAccounting):
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_deleted():
            acct.freed(leaf.nbytes)
            leaf.delete()


def _overlay_consuming(target, ckpt, acct: _RestoreAccounting):
    """`restore_into` that FREES each replaced init leaf before
    device-putting its restored value: any subtree the checkpoint
    covers swaps device residency leaf-by-leaf instead of doubling it;
    init leaves the checkpoint does not cover (e.g. the frozen core
    under a `_sans_core` payload) are kept."""
    if isinstance(target, dict) and isinstance(ckpt, dict):
        out = dict(target)
        for k, v in ckpt.items():
            if k in target:
                out[k] = _overlay_consuming(target[k], v, acct)
        return out
    if ckpt is None:
        return target
    if isinstance(target, jax.Array) and not target.is_deleted():
        acct.freed(target.nbytes)
        target.delete()
    put = jax.device_put(ckpt)
    acct.put(put.nbytes)
    return put


def _restore_state(ckpt_dir: str, tag: str, state, state_cls):
    """Full-state resume: params + optimizer state + step + epoch
    (reference train_neurons.py:342-352 restores model/opt/sched/epoch;
    the LR schedule lives in the optax opt_state step counters).

    CONSUMES `state`: the restore runs host-side first (the on-disk
    structure is read from Orbax metadata and restored into abstract
    ShapeDtypeStruct templates — zero HBM), then every init device
    buffer the checkpoint replaces is freed BEFORE its restored value
    is device-put. Peak HBM residency is therefore ~one train state
    (+ one leaf transient), not two: the round-4 endurance run OOM'd
    exactly here, device-putting a full second params+opt copy against
    the live init state (/tmp/train_stage2.log RESOURCE_EXHAUSTED).
    The passed `state` must not be used after this returns.

    Handles all three payload generations: full-tree (end-of-training
    saves), trained-subtree (`_sans_core` mid-run saves — init leaves
    not in the payload, i.e. the frozen core, are kept), and legacy
    params-only (no opt_state on disk: init opt_state is kept and the
    LR schedule restarts — loudly logged). Returns
    (new_state, start_epoch, extra_dict)."""
    md = ckpt_lib.metadata_tree(ckpt_dir, tag)
    acct = _RestoreAccounting()
    abstract = lambda t: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        if hasattr(x, "dtype") else x, t)
    has_opt = isinstance(md, dict) and "opt_state" in md
    loaded = None
    if md is not None:
        template = {k: ckpt_lib.shape_template(v) for k, v in md.items()
                    if k != "opt_state"}
        if has_opt:
            template["opt_state"] = abstract(state.opt_state)
        try:
            loaded = ckpt_lib.load_ckpt(ckpt_dir, tag, template=template,
                                        host=True)
        except Exception as e:  # opt structure drift (optimizer changed)
            _log(f"--- resume: opt_state template restore of {tag} failed "
                 f"({type(e).__name__}: {e}); falling back to params-only "
                 f"resume — optimizer state and LR schedule RESTART ---")
            if has_opt:
                template["opt_state"] = ckpt_lib.shape_template(
                    md["opt_state"])
            loaded = ckpt_lib.load_ckpt(ckpt_dir, tag, template=template,
                                        host=True)
            has_opt = False  # raw dict opt_state is unusable: discard
    else:  # metadata API unavailable: raw host restore (still no HBM)
        _log(f"--- resume: orbax metadata unavailable for {tag}; raw "
             f"host restore ---")
        loaded = ckpt_lib.load_ckpt(ckpt_dir, tag, host=True)
        has_opt = isinstance(loaded, dict) and "opt_state" in loaded
        if has_opt:  # raw restore loses the NamedTuple typing: re-read
            try:
                loaded = ckpt_lib.load_ckpt(
                    ckpt_dir, tag, host=True,
                    template={**{k: abstract(v) for k, v in loaded.items()
                                 if k != "opt_state"},
                              "opt_state": abstract(state.opt_state)})
            except Exception as e:
                _log(f"--- resume: opt_state re-read failed "
                     f"({type(e).__name__}); params-only resume ---")
                has_opt = False
    if has_opt:
        _delete_device_tree(state.opt_state, acct)
        opt_state = jax.tree_util.tree_map(
            lambda x: acct.put(np.asarray(x).nbytes) or jax.device_put(x)
            if isinstance(x, np.ndarray) else x, loaded["opt_state"])
    else:
        opt_state = state.opt_state
        if "opt_state" not in (md or {}):
            _log(f"--- resume: {tag} carries no opt_state (legacy "
                 f"params-only payload) — optimizer state and LR "
                 f"schedule restart ---")
    params = _overlay_consuming(state.params, loaded["params"], acct)
    LAST_RESTORE_STATS.clear()
    LAST_RESTORE_STATS.update(
        peak_extra_bytes=acct.peak_extra, freed_bytes=acct.freed_bytes,
        put_bytes=acct.put_bytes)
    new_state = state_cls(params, opt_state, jnp.asarray(loaded["step"]))
    extra = loaded.get("extra") or {}
    return new_state, int(loaded["epoch"]) + 1, extra


def run_stage1(bcfg: BrainModelConfig, tcfg: TrainConfig, mesh,
               train_split: cc2017.CC2017Split,
               test_split: cc2017.CC2017Split,
               clip_targets_train: np.ndarray,
               clip_targets_test: np.ndarray,
               ckpt_dir: Optional[str] = None,
               log_every: int = 50, logger=None,
               resume: bool = False,
               stop_after_epochs: Optional[int] = None,
               warm_start_params=None,
               async_saves: bool = False,
               best_save_every: int = 1,
               ) -> train_brain.TrainState:
    """Stage-1 training (reference `--no-neurons_decoupler` branch).
    `best_save_every=k` throttles the best-metric `brain_model` save to
    at most one per k epochs (same contract and same honesty caveats as
    run_stage2's: under throttling a deferred save writes the SAVE-epoch
    params; extras carry best/save-epoch provenance; an unsaved
    improvement is flushed on the final epoch and on preemption). The
    production stage-1 recipe needs this on the harness tunnel: each
    h=2048 save is ~3.5 GB at ~8 MB/s D2H, and the retrieval metric
    improves most epochs early on.
    clip_targets_*: precomputed CLIP tables [N, n_frames, 256, 1664].
    `warm_start_params`: partial params overlay applied after init — the
    reference's MindEye2 `last.pth` backbone + `coco_tokens_avg_proj.pth`
    clipproj warm start (train_neurons.py:229-241); a `resume` restore
    takes precedence.
    `resume=True` restores params/opt-state/epoch from brain_model_last
    (reference --resume_from_ckpt, train_neurons.py:342-352).
    `stop_after_epochs=k` simulates a preemption: save the full-state
    `_last` checkpoint after k epochs and return (the LR schedule keeps
    the full num_epochs horizon, so a resumed run is step-identical to
    an uninterrupted one)."""
    if logger is None:
        from neurons_tpu.utils.metrics_log import MetricLogger
        logger = MetricLogger(log_dir=ckpt_dir)
    steps_per_epoch = max(len(train_split) // tcfg.batch_size, 1)
    key = root_key(tcfg.seed)
    model, state, tx = train_brain.init_stage1(bcfg, tcfg, steps_per_epoch,
                                               key)
    if warm_start_params is not None:
        state = state._replace(params=ckpt_lib.restore_into(
            state.params, warm_start_params))
    step_fn = train_brain.make_stage1_train_step(model, tx, tcfg)
    eval_fn = train_brain.make_stage1_eval_step(model)

    start_epoch = 0
    best_metric = -np.inf
    if resume and ckpt_dir and ckpt_lib.exists(ckpt_dir, "brain_model_last"):
        state, start_epoch, rextra = _restore_state(
            ckpt_dir, "brain_model_last", state, train_brain.TrainState)
        best_metric = float(rextra.get("best_metric", -np.inf))
        _log(f"--- resumed brain_model_last at epoch {start_epoch} "
             f"(best_metric {best_metric:.3f}) ---")

    saver = (ckpt_lib.AsyncCkptWriter() if (async_saves and ckpt_dir)
             else None)
    _mid_save = saver.submit if saver is not None else ckpt_lib.save_ckpt
    try:
        state = _stage1_epochs(
            bcfg, tcfg, mesh, train_split, test_split, clip_targets_train,
            clip_targets_test, ckpt_dir, log_every, logger,
            stop_after_epochs, saver, _mid_save, state, step_fn, eval_fn,
            key, start_epoch, best_metric, best_save_every)
    except BaseException:
        if saver is not None:
            saver.abort()  # drop queued snapshots; don't leak the thread
        raise
    if saver is not None:
        saver.close()
    return state


def _stage1_epochs(bcfg, tcfg, mesh, train_split, test_split,
                   clip_targets_train, clip_targets_test, ckpt_dir,
                   log_every, logger, stop_after_epochs, saver, _mid_save,
                   state, step_fn, eval_fn, key, start_epoch, best_metric,
                   best_save_every=1):
    best_epoch = -1
    pending_best = False
    last_best_saved = -(1 << 30)
    for epoch in range(start_epoch, tcfg.num_epochs):
        t0 = time.time()
        ep_losses = []
        def _stage1_batches():
            for batch in cc2017.batches(train_split, tcfg.batch_size,
                                        seed=tcfg.seed + epoch):
                if callable(clip_targets_train):
                    # wire-light device-materialized targets (see
                    # _eval_targets): epoch-parity voxel repeat stays
                    # host-side, the 204 MB/step CLIP target chunk is
                    # built on device from the batch indices
                    voxel = batch["voxel"][:, epoch % 2][:, None]
                    target = clip_targets_train(batch["index"], epoch)
                else:
                    voxel, target = train_brain.select_stage1_inputs(
                        batch, epoch, clip_targets_train)
                yield {"voxel": voxel, "target": target,
                       "text": batch["text_emb"]}

        # device prefetch + on-device metrics: no host sync inside the
        # hot loop (float() would block dispatch every step)
        for it, sb in enumerate(prefetch_to_device(_stage1_batches(), mesh)):
            state, metrics = step_fn(state, epoch_key(key, epoch, it),
                                     sb["voxel"], sb["target"], sb["text"])
            ep_losses.append(metrics["loss"])
            if it % log_every == 0:
                _log(f"epoch {epoch} it {it}: loss={float(metrics['loss']):.4f}")
        ep_losses = [float(x) for x in ep_losses]

        # epoch-end eval in retrieval batches of 100 (the reference's
        # test_dl batch_size=100, train_neurons.py:119 — retrieval top-1
        # is a 99-distractor task, NOT full-test-set retrieval)
        eval_bs = min(100, len(test_split))
        sums = {"test_fwd_percent_correct": 0.0,
                "test_bwd_percent_correct": 0.0,
                "text_fwd_percent_correct": 0.0}
        nb = 0
        for start in range(0, len(test_split) - eval_bs + 1, eval_bs):
            sl = slice(start, start + eval_bs)
            ev = eval_fn(state.params,
                         jnp.asarray(test_split.voxel[sl, :1]),
                         _eval_targets(clip_targets_test, sl),
                         jnp.asarray(test_split.text_emb[sl]))
            for k in sums:
                sums[k] += float(ev[k])
            nb += 1
        fwd = sums["test_fwd_percent_correct"] / nb
        bwd = sums["test_bwd_percent_correct"] / nb
        txt = sums["text_fwd_percent_correct"] / nb
        metric = fwd + bwd + txt
        _log(f"epoch {epoch}: mean_loss={np.mean(ep_losses):.4f} fwd={fwd:.3f} "
             f"bwd={bwd:.3f} txt={txt:.3f} ({time.time() - t0:.1f}s)")
        logger.log_metrics({"epoch": epoch,
                            "train/mean_loss": float(np.mean(ep_losses)),
                            "test/fwd_pct": fwd, "test/bwd_pct": bwd,
                            "test/text_pct": txt,
                            "epoch_seconds": time.time() - t0},
                           step=int(state.step))
        if metric > best_metric:
            best_metric, best_epoch = metric, epoch
            pending_best = True
        if ckpt_dir and pending_best and (
                epoch - last_best_saved >= best_save_every
                or epoch == tcfg.num_epochs - 1):
            if epoch == best_epoch:
                _log(f"  new best metric {best_metric:.3f} -> "
                     f"saved brain_model")
            else:
                _log(f"  best metric {best_metric:.3f} seen at epoch "
                     f"{best_epoch}; saving epoch {epoch} params "
                     f"(metric {metric:.3f}; best_save_every="
                     f"{best_save_every} throttle — tag approximate)")
            _mid_save(ckpt_dir, "brain_model", params=state.params,
                      opt_state=None, step=int(state.step), epoch=epoch,
                      extra={**_best_extra(best_metric, best_epoch),
                             "save_epoch_metric": np.asarray(
                                 float(metric), np.float64)})
            last_best_saved = epoch
            pending_best = False
        if (stop_after_epochs is not None
                and epoch + 1 - start_epoch >= stop_after_epochs
                and epoch + 1 < tcfg.num_epochs):
            if ckpt_dir:
                if saver is not None:
                    saver.drain()
                if pending_best:
                    _log(f"  flushing pending best "
                         f"(metric {best_metric:.3f}, epoch {best_epoch}) "
                         f"before preemption")
                    ckpt_lib.save_ckpt(
                        ckpt_dir, "brain_model", params=state.params,
                        opt_state=None, step=int(state.step), epoch=epoch,
                        extra=_best_extra(best_metric, best_epoch))
                ckpt_lib.save_ckpt(ckpt_dir, "brain_model_last",
                                   params=state.params,
                                   opt_state=state.opt_state,
                                   step=int(state.step), epoch=epoch,
                                   extra=_best_extra(best_metric,
                                                     best_epoch))
            _log(f"--- simulated preemption after epoch {epoch} ---")
            return state
    if saver is not None:
        saver.drain()
    if ckpt_dir and tcfg.ckpt_saving:
        ckpt_lib.save_ckpt(ckpt_dir, "brain_model_last", params=state.params,
                           opt_state=state.opt_state, step=int(state.step),
                           epoch=tcfg.num_epochs - 1,
                           extra=_best_extra(best_metric, best_epoch))
    return state


def _best_extra(best_metric: float, epoch: int) -> Dict:
    """best-gate state persisted with every `_last` save so a resumed
    run keeps the best-metric watermark instead of resetting it to -inf
    (which could overwrite the best checkpoint with a worse post-resume
    model — ADVICE r4)."""
    return {"best_metric": np.asarray(float(best_metric), np.float64),
            "best_epoch": np.asarray(int(epoch), np.int64)}


def run_stage2(bcfg: BrainModelConfig, pcfg: PriorConfig,
               dcfg: DecouplerConfig, tcfg: TrainConfig, gpt2_cfg, mesh,
               train_split: cc2017.CC2017Split,
               batch_builder: Callable[[Dict, int], Dict],
               core_params=None, ckpt_dir: Optional[str] = None,
               log_every: int = 50, logger=None,
               resume: bool = False,
               test_split: Optional[cc2017.CC2017Split] = None,
               clip_targets_test: Optional[np.ndarray] = None,
               image_log_every: int = 1,
               bf16_frozen_core: bool = False,
               last_save_every: int = 0,
               stop_after_epochs: Optional[int] = None,
               async_saves: bool = False,
               best_save_every: int = 1,
               ) -> train_brain.TrainState:
    """Stage-2 training (reference `--neurons_decoupler` branch).
    `batch_builder(batch, epoch)` assembles the precomputed-table fields
    (clip targets, class text embeds, VAE latents) for a raw batch.
    With `test_split` + `clip_targets_test`, the per-epoch
    `brain_model_prior` save is gated on the best retrieval metric
    (reference train_neurons.py:629-641); otherwise it saves every
    epoch.
    `bf16_frozen_core=True` holds the forward-only stage-1 core in bf16
    (the reference trains under fp16 autocast, train_neurons.py:17;
    ~3.9 GB HBM back — required for full size + Adam on one 16 GB v5e,
    measured in tools/train_bench.py).
    `last_save_every=k` writes the full-state `brain_model_prior_last`
    every k epochs so a mid-run SIGKILL resumes losslessly (the
    reference only writes `_last` at the very end, :646-650).
    `stop_after_epochs=k` simulates a preemption like run_stage1's.
    Mid-run saves carry the trained subtree only (`_sans_core`) and,
    with `async_saves=True`, overlap their device->host fetch + write
    with the next epochs' compute (`ckpt_lib.AsyncCkptWriter`); the
    end-of-training `_last` is always a synchronous full-tree save.
    Caveat measured at full size on one 16 GB v5e: the async writer's
    on-device snapshot needs trained-subtree-sized HBM headroom
    (~2.4 GB here) and OOMs against the donated train state — on
    single-chip full-size runs keep `async_saves=False` and use
    `best_save_every=k` instead, which throttles the best-metric save
    to at most one per k epochs (best tracking itself stays
    per-epoch; an unsaved improvement is flushed on the final epoch and
    on preemption). Under throttling a deferred save writes the
    SAVE-epoch params, so the `brain_model_prior` tag is approximate —
    the checkpoint's `extra` records best_metric/best_epoch and the
    save-epoch metric, and the log says which epoch was written.
    On hosts with normal D2H bandwidth neither knob matters."""
    if logger is None:
        from neurons_tpu.utils.metrics_log import MetricLogger
        logger = MetricLogger(log_dir=ckpt_dir)
    steps_per_epoch = max(len(train_split) // tcfg.batch_size, 1)
    key = root_key(tcfg.seed)
    bundle, state = train_decoupler.init_stage2(
        bcfg, pcfg, dcfg, tcfg, gpt2_cfg, steps_per_epoch, key,
        core_params=core_params)
    step_fn = train_decoupler.make_stage2_train_step(bundle, tcfg, dcfg,
                                                     steps_per_epoch)
    soft_temps = np.asarray(losses.cosine_anneal(
        tcfg.soft_temp_start, tcfg.soft_temp_end,
        max(tcfg.num_epochs - int(tcfg.mixup_pct * tcfg.num_epochs), 1)))

    if bf16_frozen_core:
        # cast BEFORE any resume restore: the restore's peak residency
        # then carries the bf16 core, not the f32 one (~3.5 GB back at
        # production width); end-of-training full-tree saves land after
        # this cast, so resumed full-tree checkpoints match dtype-wise
        params = dict(state.params)
        params["core"] = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params["core"])
        state = train_decoupler.TrainState(params, state.opt_state,
                                           state.step)
    start_epoch = 0
    best_metric = -np.inf
    best_epoch = -1
    if resume and ckpt_dir and ckpt_lib.exists(ckpt_dir,
                                               "brain_model_prior_last"):
        state, start_epoch, rextra = _restore_state(
            ckpt_dir, "brain_model_prior_last", state,
            train_decoupler.TrainState)
        best_metric = float(rextra.get("best_metric", -np.inf))
        best_epoch = int(rextra.get("best_epoch", -1))
        _log(f"--- resumed brain_model_prior_last at epoch {start_epoch} "
             f"(best_metric {best_metric:.3f}) ---")
    if (ckpt_dir and tcfg.ckpt_saving
            and isinstance(state.params, dict) and "core" in state.params
            and not ckpt_lib.exists(ckpt_dir, "brain_model_core")):
        # one-time frozen-core artifact: mid-run saves carry only the
        # trained subtree (`_sans_core`), so WITHOUT this a run killed
        # before the final full-tree `_last` would leave no on-disk
        # copy of the core and the CLI would silently generate with a
        # random frozen core (ADVICE r4 high). Written once per
        # ckpt_dir (the core is immutable during stage 2).
        t0 = time.time()
        ckpt_lib.save_ckpt(ckpt_dir, "brain_model_core",
                           params={"core": state.params["core"]})
        _log(f"--- wrote one-time brain_model_core artifact "
             f"({time.time() - t0:.1f}s) ---")

    core_eval = None
    if test_split is not None and clip_targets_test is not None:
        from neurons_tpu.models.neurons import NeuronsCore
        core_eval = train_brain.make_stage1_eval_step(
            NeuronsCore(bcfg))
    saver = (ckpt_lib.AsyncCkptWriter() if (async_saves and ckpt_dir)
             else None)
    _mid_save = saver.submit if saver is not None else ckpt_lib.save_ckpt
    panel_fn = (train_decoupler.make_stage2_seg_panel_fn(bundle, dcfg)
                if image_log_every else None)
    try:
        state = _stage2_epochs(
            tcfg, dcfg, mesh, train_split, batch_builder, ckpt_dir,
            log_every, logger, test_split, clip_targets_test,
            image_log_every, last_save_every, stop_after_epochs,
            best_save_every, state, step_fn, soft_temps, key, core_eval,
            saver, _mid_save, panel_fn, start_epoch, best_metric,
            best_epoch)
    except BaseException:
        if saver is not None:
            saver.abort()  # drop queued snapshots; don't leak the thread
        raise
    if saver is not None:
        saver.close()
    return state


def _stage2_epochs(tcfg, dcfg, mesh, train_split, batch_builder, ckpt_dir,
                   log_every, logger, test_split, clip_targets_test,
                   image_log_every, last_save_every, stop_after_epochs,
                   best_save_every, state, step_fn, soft_temps, key,
                   core_eval, saver, _mid_save, panel_fn, start_epoch,
                   best_metric, best_epoch):
    pending_best = False
    last_best_saved = -(1 << 30)
    for epoch in range(start_epoch, tcfg.num_epochs):
        t0 = time.time()
        ep_losses = []
        ep_comps: Dict[str, list] = {}
        temp_idx = min(max(epoch - int(tcfg.mixup_pct * tcfg.num_epochs), 0),
                       len(soft_temps) - 1)
        def _stage2_batches():
            for batch in cc2017.batches(train_split, tcfg.batch_size,
                                        seed=tcfg.seed + epoch):
                yield batch_builder(batch, epoch)

        last_batch = None
        for it, sb in enumerate(prefetch_to_device(_stage2_batches(), mesh)):
            state, metrics = step_fn(state, epoch_key(key, epoch, it), sb,
                                     jnp.asarray(epoch), jnp.asarray(it),
                                     jnp.asarray(soft_temps[temp_idx]))
            ep_losses.append(metrics["loss"])
            # every loss component, still async (float() only at epoch
            # end) — the production-run artifact wants per-epoch curves
            # of each term (reference logs them per step, :505-529)
            for k, v in metrics.items():
                ep_comps.setdefault(k, []).append(v)
            last_batch = sb
            if it % log_every == 0:
                _log(f"epoch {epoch} it {it}: "
                     f"loss={float(metrics['loss']):.4f} "
                     f"prior={float(metrics['loss_prior']):.4f} "
                     f"seg={float(metrics['loss_key_obj_seg']):.4f}")
        # seg-mask image panels (reference train_neurons.py:464-477)
        if (panel_fn is not None and epoch % image_log_every == 0
                and last_batch is not None):
            nshow = min(4, int(last_batch["voxel"].shape[0]))
            small = {k: v[:nshow] for k, v in last_batch.items()}
            pred, gt = panel_fn(state.params, epoch_key(key, epoch, 0),
                                small)
            logger.log_images(
                {"seg_pred": np.asarray(pred), "seg_gt": np.asarray(gt)},
                step=int(state.step))
        ep_losses = [float(x) for x in ep_losses]
        _log(f"epoch {epoch}: mean_loss={np.mean(ep_losses):.4f} "
             f"({time.time() - t0:.1f}s)")
        metric = None
        if core_eval is not None:
            eval_bs = min(100, len(test_split))
            acc = [0.0, 0.0, 0.0]
            nb = 0
            for start in range(0, len(test_split) - eval_bs + 1, eval_bs):
                sl = slice(start, start + eval_bs)
                ev = core_eval(state.params["core"],
                               jnp.asarray(test_split.voxel[sl, :1]),
                               _eval_targets(clip_targets_test, sl),
                               jnp.asarray(test_split.text_emb[sl]))
                acc[0] += float(ev["test_fwd_percent_correct"])
                acc[1] += float(ev["test_bwd_percent_correct"])
                acc[2] += float(ev["text_fwd_percent_correct"])
                nb += 1
            metric = sum(a / nb for a in acc)
            _log(f"epoch {epoch}: eval metric {metric:.3f}")
        logger.log_metrics({"epoch": epoch,
                            "train/mean_loss": float(np.mean(ep_losses)),
                            **{f"train/mean_{k}": float(np.mean(
                                [float(x) for x in v]))
                               for k, v in ep_comps.items() if k != "loss"},
                            **({"test/retrieval_metric": metric}
                               if metric is not None else {}),
                            "epoch_seconds": time.time() - t0},
                           step=int(state.step))
        if metric is None or metric > best_metric:
            if metric is not None:
                best_metric, best_epoch = metric, epoch
            pending_best = True
        if ckpt_dir and pending_best and (
                epoch - last_best_saved >= best_save_every
                or epoch == tcfg.num_epochs - 1):
            # Under best_save_every>1 a deferred save writes the CURRENT
            # epoch's params (snapshotting the improving epoch's params
            # on device is not affordable at full size: the 2.4 GB copy
            # is the same HBM headroom that OOM'd async_saves). Be
            # honest about it: log + persist both the watermark and the
            # save-epoch metric, so the tag is auditable (ADVICE r4).
            if metric is not None:
                if epoch == best_epoch:
                    _log(f"  new best metric {best_metric:.3f} -> "
                         f"saved brain_model_prior")
                else:
                    _log(f"  best metric {best_metric:.3f} seen at epoch "
                         f"{best_epoch}; saving epoch {epoch} params "
                         f"(metric {metric:.3f}; best_save_every="
                         f"{best_save_every} throttle — tag approximate)")
            _mid_save(ckpt_dir, "brain_model_prior",
                      params=_sans_core(state.params),
                      step=int(state.step), epoch=epoch,
                      extra={**_best_extra(best_metric, best_epoch),
                             "save_epoch_metric": np.asarray(
                                 float(metric) if metric is not None
                                 else float("nan"), np.float64)})
            last_best_saved = epoch
            pending_best = False
        if (ckpt_dir and last_save_every
                and (epoch + 1) % last_save_every == 0):
            _mid_save(ckpt_dir, "brain_model_prior_last",
                      params=_sans_core(state.params),
                      opt_state=state.opt_state,
                      step=int(state.step), epoch=epoch,
                      extra=_best_extra(best_metric, best_epoch))
        if (stop_after_epochs is not None
                and epoch + 1 - start_epoch >= stop_after_epochs
                and epoch + 1 < tcfg.num_epochs):
            if ckpt_dir:
                if saver is not None:
                    saver.drain()
                if pending_best:  # don't drop an unsaved improvement
                    _log(f"  flushing pending best "
                         f"(metric {best_metric:.3f}, epoch {best_epoch}) "
                         f"before preemption")
                    ckpt_lib.save_ckpt(
                        ckpt_dir, "brain_model_prior",
                        params=_sans_core(state.params),
                        step=int(state.step), epoch=epoch,
                        extra=_best_extra(best_metric, best_epoch))
                ckpt_lib.save_ckpt(ckpt_dir, "brain_model_prior_last",
                                   params=_sans_core(state.params),
                                   opt_state=state.opt_state,
                                   step=int(state.step), epoch=epoch,
                                   extra=_best_extra(best_metric,
                                                     best_epoch))
            _log(f"--- simulated preemption after epoch {epoch} ---")
            return state
    if saver is not None:
        saver.drain()  # never race the full-tree save below on a tag
    if ckpt_dir and tcfg.ckpt_saving:
        ckpt_lib.save_ckpt(ckpt_dir, "brain_model_prior_last",
                           params=state.params, opt_state=state.opt_state,
                           step=int(state.step), epoch=tcfg.num_epochs - 1,
                           extra=_best_extra(best_metric, best_epoch))
    return state


def synthetic_stage2_batch_builder(bcfg: BrainModelConfig,
                                   dcfg: DecouplerConfig, gpt2_vocab: int,
                                   seed: int = 0) -> Callable:
    """Batch builder with random frozen-encoder tables — the smoke/bench
    path when real CLIP/VAE tables are absent."""
    g = np.random.default_rng(seed)

    def build(batch: Dict, epoch: int) -> Dict:
        b = len(batch["voxel"])
        f = dcfg.n_frames
        n, c = bcfg.clip_seq_dim, bcfg.clip_emb_dim
        return {
            "voxel": batch["voxel"][:, :1].astype(np.float32),
            "clip_vision_target": g.normal(size=(b, n, c)).astype(np.float32),
            "clip_video_target": g.normal(size=(b, f, n, c)).astype(np.float32),
            "text_emb": batch["text_emb"].astype(np.float32),
            "key_obj_text_embed": g.normal(
                size=(b, dcfg.clip_txt_emb_dim)).astype(np.float32),
            "key_obj_masks": batch["key_obj_masks"][:, :f].astype(np.float32),
            "cls_label": batch["cls_label"].astype(np.float32),
            "clip_tokens": (batch["clip_tokens"][:, :12] % gpt2_vocab
                            ).astype(np.int32),
            "vae_latents": g.normal(size=(b, f, 4, 8, 8)).astype(np.float32),
        }

    return build


def structured_stage2_batch_builder(clip_targets: np.ndarray,
                                    aux: Dict, split: cc2017.CC2017Split,
                                    dcfg: DecouplerConfig,
                                    gpt2_vocab: int) -> Callable:
    """Batch builder over `cc2017.structured_synthetic_split` outputs:
    per-sample deterministic targets (indexed by the batch's global
    'index'), so stage-2 losses genuinely converge — the convergence-run
    harness (tools/convergence_run.py) uses this."""

    def build(batch: Dict, epoch: int) -> Dict:
        f = dcfg.n_frames
        idx = batch["index"]
        video = np.asarray(clip_targets[idx, :f], np.float32)
        key_cls = batch["key_obj_cls"].astype(np.int64)
        return {
            "voxel": batch["voxel"][:, :1].astype(np.float32),
            "clip_vision_target": video[:, min(2, f - 1)],
            "clip_video_target": video,
            "text_emb": batch["text_emb"].astype(np.float32),
            "key_obj_text_embed": aux["class_text_embeds"][key_cls],
            "key_obj_masks": batch["key_obj_masks"][:, :f].astype(np.float32),
            "cls_label": batch["cls_label"].astype(np.float32),
            "clip_tokens": (batch["clip_tokens"][:, :12] % gpt2_vocab
                            ).astype(np.int32),
            "vae_latents": np.asarray(aux["vae_latents"][idx, :f],
                                      np.float32),
        }

    return build


def table_stage2_batch_builder(root_dir: str, dcfg: DecouplerConfig,
                               gpt2_vocab: int,
                               caption_token_len: int = 60) -> Callable:
    """Real-data batch builder: streams the precomputed frozen-encoder
    tables written by `neurons precompute` (data/precompute.py) — the
    TPU-side replacement for the reference's in-loop frozen CLIP/VAE
    forwards (reference train_neurons.py:400,457,498-499). Requires
    batches carrying an 'index' field (added by the training loop) plus
    the CC2017 fields."""
    import os

    clip_t = np.load(os.path.join(root_dir, "clip_targets_train.npy"),
                     mmap_mode="r")
    vae_t = np.load(os.path.join(root_dir, "vae_latents_train.npy"),
                    mmap_mode="r")
    class_emb = np.load(os.path.join(root_dir, "class_text_embeds.npy"))

    def build(batch: Dict, epoch: int) -> Dict:
        f = dcfg.n_frames
        idx = batch["index"]
        video = np.asarray(clip_t[idx, :f], np.float32)  # [B,F,256,1664]
        key_cls = batch["key_obj_cls"].astype(np.int64)
        return {
            "voxel": batch["voxel"][:, :1].astype(np.float32),
            "clip_vision_target": video[:, min(2, f - 1)],
            "clip_video_target": video,
            "text_emb": batch["text_emb"].astype(np.float32),
            "key_obj_text_embed": class_emb[key_cls].astype(np.float32),
            "key_obj_masks": batch["key_obj_masks"][:, :f].astype(np.float32),
            "cls_label": batch["cls_label"].astype(np.float32),
            "clip_tokens": (batch["clip_tokens"][:, :caption_token_len]
                            % gpt2_vocab).astype(np.int32),
            "vae_latents": np.asarray(vae_t[idx, :f], np.float32),
        }

    return build
