"""`neurons` — the staged CLI.

Mirrors the reference's public surface (`bash train_neurons.sh <gpu> <exp>
<stages:123456e> <mode> <subj>`, reference train_neurons.sh:1-17 +
README.md:100-124) as subcommands with the same hyperparameter names:

  neurons train-brain      stage 1  (train_neurons.py, no decoupler)
  neurons train-decoupler  stage 2  (train_neurons.py --neurons_decoupler)
  neurons recon [--enhance]stage 3  (recon_keyframe_neurons{_enhance}.py)
  neurons caption          stage 4  (caption_keyframe*.py)
  neurons video            stage 5  (scripts/neuroclips_video*.py)
  neurons eval             stage 6  (run_metrics.py)
  neurons decoupled-eval   stage e  (gen_decoupled_outputs.py)
  neurons pipeline 123456  run stages in sequence

`--synthetic --tiny` runs any stage on random data at miniature dims — the
stage-gated smoke path (SURVEY.md section 4 test strategy).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time as _time


def _add_common(p):
    p.add_argument("--subj", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--exp", type=str, default="exp1")
    p.add_argument("--root_dir", type=str, default="./cc2017_dataset")
    p.add_argument("--exp_dir", type=str, default="./EXP")
    p.add_argument("--weights_dir", type=str, default="./pretrained_weights")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", action="store_true",
                   help="run on random data (no dataset needed)")
    p.add_argument("--tiny", action="store_true",
                   help="miniature model dims (smoke mode)")
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (cpu/tpu)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the stage to DIR")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (numerical sanitizer)")
    p.add_argument("--n_test", type=int, default=0,
                   help="cap the number of test clips stages 3/5/6 "
                        "process (0 = 4 with --synthetic, else the full "
                        "test split — 1200 on CC2017)")
    p.add_argument("--dtype", type=str, default=None,
                   choices=["bf16", "f32"],
                   help="module compute dtype for generation stages "
                        "(sampler math stays f32). Default: bf16 at "
                        "full size — the reference serves stage 5 under "
                        "fp16 autocast, and f32 activations blow the "
                        "16 GB v5e HBM at production batch sizes — and "
                        "f32 with --tiny")


def _add_train_args(p):
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--num_epochs", type=int, default=150)
    p.add_argument("--max_lr", type=float, default=3e-4)
    p.add_argument("--mixup_pct", type=float, default=0.33)
    p.add_argument("--prior_scale", type=float, default=30.0)
    p.add_argument("--n_blocks", type=int, default=4)
    p.add_argument("--n_frames", type=int, default=6)
    p.add_argument("--hidden_dim", type=int, default=4096)
    p.add_argument("--lr_scheduler_type", type=str, default="cycle",
                   choices=["cycle", "linear", "cosine"])
    p.add_argument("--ckpt_saving", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--resume_from_ckpt", action="store_true",
                   help="resume params/opt-state/epoch from the *_last "
                        "checkpoint (reference train_neurons.py:342-352)")


def _setup(args):
    _CMD_T0[:] = [_time.perf_counter()]
    if getattr(args, "tiny", False) or getattr(args, "synthetic", False):
        # synthetic paths may tokenize without the CLIP BPE asset; real
        # runs hard-error instead (data/clip_tokenizer.py)
        os.environ.setdefault("NEURONS_TPU_ALLOW_BYTE_TOKENIZER", "1")
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    from neurons_tpu.utils import compile_cache
    compile_cache.setup("cpu" if args.platform == "cpu" else "tpu")
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)


def _configs(args, stage2: bool = False):
    from neurons_tpu import config as C

    if args.tiny:
        bcfg = C.BrainModelConfig(hidden_dim=32, n_blocks=1, clip_seq_dim=16,
                                  clip_emb_dim=32, clip_txt_emb_dim=24,
                                  subjects=(args.subj,))
        pcfg = C.PriorConfig(dim=32, depth=1, dim_head=8, heads=4,
                             num_tokens=16, timesteps=5)
        dcfg = C.DecouplerConfig(n_frames=2, num_classes=51, clip_emb_dim=32,
                                 clip_txt_emb_dim=24,
                                 decoder_block_out_channels=(8, 8, 8))
    else:
        bcfg = C.BrainModelConfig(hidden_dim=args.hidden_dim,
                                  n_blocks=args.n_blocks,
                                  subjects=(args.subj,))
        pcfg = C.PriorConfig()
        dcfg = C.DecouplerConfig(n_frames=args.n_frames)
    tcfg = C.TrainConfig(
        subj=args.subj, batch_size=args.batch_size,
        num_epochs=args.num_epochs, max_lr=args.max_lr,
        mixup_pct=args.mixup_pct, prior_scale=args.prior_scale,
        lr_scheduler_type=args.lr_scheduler_type,
        neurons_decoupler=stage2, n_frames=args.n_frames, seed=args.seed,
        ckpt_saving=args.ckpt_saving,
        num_train_samples=32 if args.synthetic else 4320,
        num_test_samples=(max(16, getattr(args, "n_test", 0))
                          if args.synthetic else 1200))
    return bcfg, pcfg, dcfg, tcfg


# per-stage steady-state throughput, recorded by the generation loops
# and merged into the pipeline report (tools/e2e_drive.py): the first
# batch carries the cold compile, so cumulative s/clip alone misleads
_STAGE_STATS: dict = {}
_CMD_T0: list = []  # set by _setup; anchors per-stage setup timing
_SETUP_S: dict = {}


def _loop_start(stage: str) -> float:
    """Anchor a generation loop's clock and report how long the stage
    spent in setup (artifact load, weight init/import, model build,
    text encode) before its first dispatch — the r4 full-split drive's
    stage-5 wall had 1285 s outside the loop that post-hoc log mining
    had to attribute (E2E_FULL_r04.json `setup_plus_drain_s`)."""
    t0 = _time.perf_counter()
    if _CMD_T0:
        _SETUP_S[stage] = t0 - _CMD_T0[0]
        print(f"--- stage {stage}: setup {_SETUP_S[stage]:.1f}s, "
              f"loop start ---", flush=True)
    return t0


_STALL_EVENTS: dict = {}  # stage -> [event dicts]; merged by _record_steady


def _watchdog(stage: str, marks, done: int, el: float,
              fetch_s: float | None = None, probe=None) -> None:
    """In-flight slow-batch visibility WITH attribution: the r4
    full-split drive hit two silent ~14/21-min mid-run stalls that
    post-hoc log mining could only hand-wave as "transient tunnel
    hiccups" (E2E_FULL_r04 stage-5 stall_events). Call BEFORE appending
    the new mark; any batch >5x the rolling median (and >60 s) logs
    immediately AND records a forensics event:
      - `fetch_block_s`: how much of the batch wall was spent blocked
        in the device->host fetch (vs host compose/GIF work),
      - `refetch_wire_s`: re-fetching the SAME already-computed device
        buffer times the wire alone AT THIS MOMENT — if it is still
        slow the tunnel is degraded right now; if fast, the stall was
        upstream of fetch completion (device queue / transient drop),
      - `attribution`: the verdict derived from the two.
    Events land in the stage's pipeline-report row (`stall_events`)."""
    if len(marks) < 4:
        return
    import statistics
    tail = marks[-51:]
    recent = [b[1] - a[1] for a, b in zip(tail, tail[1:])]
    dt = el - marks[-1][1]
    med = statistics.median(recent)
    if dt <= max(60.0, 5.0 * med):
        return
    ev = {"clips_done": done, "batch_s": round(dt, 1),
          "rolling_median_s": round(med, 2)}
    if fetch_s is not None:
        ev["fetch_block_s"] = round(fetch_s, 1)
    if probe is not None:
        t1 = _time.perf_counter()
        try:
            import numpy as _np
            arr = _np.asarray(probe)
            ev["refetch_wire_s"] = round(_time.perf_counter() - t1, 2)
            ev["refetch_mb"] = round(arr.nbytes / 1e6, 1)
        except Exception as e:  # the wire itself may be down
            ev["refetch_error"] = f"{type(e).__name__}: {e}"
    if fetch_s is not None and fetch_s < 0.5 * dt:
        ev["attribution"] = ("host-side: the fetch block was minor — "
                             "compose/GIF or python-side delay")
    elif ev.get("refetch_error"):
        ev["attribution"] = "wire down at re-fetch"
    elif ev.get("refetch_wire_s", 0.0) > 0.25 * dt:
        ev["attribution"] = "wire still degraded at re-fetch (tunnel)"
    else:
        ev["attribution"] = ("blocked awaiting result; wire healthy at "
                             "re-fetch -> device queue or transient "
                             "tunnel stall that has passed")
    _STALL_EVENTS.setdefault(stage, []).append(ev)
    print(f"!!! stage {stage} WATCHDOG: batch ending at clip {done} "
          f"took {dt:.1f}s (rolling median {med:.1f}s) — {ev['attribution']}",
          flush=True)


_LAST_FETCH_S: dict = {}  # stage -> last batch's fetch block (phase acct)


def _fetch_retry(stage: str, fetch, redispatch):
    """Run a device->host fetch; on a FAILED fetch (tunnel error — not
    a slow one), re-dispatch the batch ONCE and re-fetch (VERDICT r4
    item 8: the watchdog used to flag and recover nothing). Returns
    (result, fetch_seconds); also records the fetch time in
    `_LAST_FETCH_S[stage]` for the loop's phase accounting."""
    t0 = _time.perf_counter()
    try:
        out = fetch()
    except Exception as e:
        print(f"!!! stage {stage}: batch fetch FAILED "
              f"({type(e).__name__}: {e}) — re-dispatching once",
              flush=True)
        _STALL_EVENTS.setdefault(stage, []).append(
            {"event": "fetch_error_redispatch",
             "error": f"{type(e).__name__}: {e}"})
        out = redispatch()
    dt = _time.perf_counter() - t0
    _LAST_FETCH_S[stage] = dt
    return out, dt


def _record_steady(stage: str, marks, batch: int, t0: float | None = None):
    """marks: [(clips_done, elapsed_s)] per batch, cumulative. Besides
    the steady rate (compile-carrying first batch excluded), long runs
    get first-/last-100-clip window rates — a flat delta across a
    1200-clip run is the no-leak/no-slowdown evidence the full-split
    drive reports (E2E_FULL artifact)."""
    n_done, t_total = marks[-1]
    t_first = marks[0][1]
    if n_done > batch:
        steady = (t_total - t_first) / (n_done - batch)
    else:
        steady = t_total / max(n_done, 1)
    stats = {"steady_s_per_clip": round(steady, 3),
             "batch": batch,
             "first_batch_s": round(t_first, 2)}
    win = 100
    if n_done - batch >= 2 * win:
        first = next(m for m in marks if m[0] >= batch + win)
        stats["first100_s_per_clip"] = round(
            (first[1] - t_first) / (first[0] - batch), 3)
        last_base = next(m for m in reversed(marks)
                         if n_done - m[0] >= win)
        stats["last100_s_per_clip"] = round(
            (t_total - last_base[1]) / (n_done - last_base[0]), 3)
    if stage in _SETUP_S:
        stats["setup_s"] = round(_SETUP_S.pop(stage), 2)
    if stage in _STALL_EVENTS:
        stats["stall_events"] = _STALL_EVENTS.pop(stage)
    if t0 is not None:
        # time between the last mark and here: GIF-pool drain / final
        # artifact writes that the loop's marks don't cover
        drain = _time.perf_counter() - t0 - t_total
        stats["post_loop_drain_s"] = round(drain, 2)
        if drain > 5:
            print(f"--- stage {stage}: post-loop drain {drain:.1f}s ---",
                  flush=True)
    _STAGE_STATS[stage] = stats


def _stage_dtype(args):
    """Module compute dtype for the generation stages (see --dtype)."""
    import jax.numpy as jnp
    name = getattr(args, "dtype", None) or (
        "f32" if args.tiny else "bf16")
    return jnp.bfloat16 if name == "bf16" else jnp.float32


def _boundary_casts(dt):
    """bench.py's apply-boundary convention: module forwards run in
    `dt`, sampler math stays f32 (cast inputs down, outputs back)."""
    import jax.numpy as jnp

    def cast_in(x):
        return (x.astype(dt) if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating) else x)

    def cast_out(x):
        return (x.astype(jnp.float32) if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating) else x)

    return cast_in, cast_out


def _cast_host_tree(tree, dt):
    """Cast imported host-numpy param trees to `dt` BEFORE device_put —
    casting 2.2B-param f32 trees on a 16 GB chip would transiently hold
    both copies."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np
    import torch

    if dt == jnp.float32:
        return tree

    def cast(x):
        if not (hasattr(x, "dtype") and
                jnp.issubdtype(np.asarray(x).dtype, jnp.floating)):
            return x
        if isinstance(x, np.ndarray):
            t = torch.from_numpy(np.ascontiguousarray(x, np.float32))
            return t.to(torch.bfloat16).view(torch.uint16).numpy() \
                .view(ml_dtypes.bfloat16)
        return x.astype(dt)  # already a device array

    return jax.tree_util.tree_map(cast, tree)


def _test_clip_count(args, available: int) -> int:
    """How many test clips a generation stage should process: --n_test
    when given; otherwise 4 in synthetic smoke mode (random weights make
    more clips pure waste) or the whole split (the reference's 1200-clip
    contract, run_metrics.py:36-47)."""
    n = getattr(args, "n_test", 0)
    if not n:
        n = 4 if (args.synthetic or args.tiny) else available
    return max(1, min(n, available))


def _warm_start_overlay(args, bcfg):
    """Pretrained warm-start layers the reference applies before BOTH
    training stages (train_neurons.py:208-241): the MindEye2 `last.pth`
    mixer backbone from --weights_dir (optional accelerator) and the
    frozen `coco_tokens_avg_proj.pth` clipproj from --root_dir. Returns a
    partial NeuronsCore params overlay, or None if neither file exists."""
    from neurons_tpu.utils.checkpoint import merge_overlays

    layers = []
    mindeye = os.path.join(args.weights_dir, "last.pth")
    if os.path.exists(mindeye):
        import torch
        from neurons_tpu.interop.torch_import import import_mindeye_backbone
        sd = torch.load(mindeye, map_location="cpu", weights_only=False)
        sd = sd.get("model_state_dict", sd)
        overlay, unused = import_mindeye_backbone(sd, n_blocks=bcfg.n_blocks)
        layers.append(overlay)
        print(f"--- MindEye2 backbone warm start ({len(unused)} "
              f"unused keys) ---")
    coco = os.path.join(args.root_dir, "coco_tokens_avg_proj.pth")
    if os.path.exists(coco):
        import torch
        from neurons_tpu.interop.torch_import import import_coco_clipproj
        proj, _ = import_coco_clipproj(
            torch.load(coco, map_location="cpu", weights_only=False))
        layers.append({"clipproj": proj})
        print("--- loaded coco_tokens_avg_proj clipproj ---")
    return merge_overlays(*layers)


def _load_decoupler_params(args, params, bcfg, pcfg, gcfg):
    """Overlay the trained decoupler weights: our Orbax checkpoint if
    present, else the reference's released torch ensemble."""
    from neurons_tpu.utils import checkpoint as ckpt_lib

    ckpt_dir = os.path.join(args.exp_dir, f"exp_{args.exp}", "checkpoints")
    torch_ckpt = os.path.join(args.weights_dir,
                              "brain_model_prior_last.pth")
    if ckpt_lib.exists(ckpt_dir, "brain_model_prior_last"):
        loaded = ckpt_lib.load_ckpt(ckpt_dir, "brain_model_prior_last")
        lp = loaded["params"]
        if (isinstance(params, dict) and "core" in params
                and not (isinstance(lp, dict) and "core" in lp)):
            # mid-run `_sans_core` payload (run killed before the final
            # full-tree save): the frozen stage-1 core lives in its own
            # artifact — overlay it too, and FAIL LOUDLY if it is
            # missing rather than silently generating with the fresh
            # random core (ADVICE r4 high)
            core_tag = next(
                (t for t in ("brain_model_core", "brain_model_last",
                             "brain_model")
                 if ckpt_lib.exists(ckpt_dir, t)), None)
            if core_tag is None:
                raise RuntimeError(
                    f"{ckpt_dir}/brain_model_prior_last carries only the "
                    f"trained decoupler subtree (mid-run save) and no "
                    f"frozen-core artifact (brain_model_core / "
                    f"brain_model_last / brain_model) exists alongside "
                    f"it — refusing to generate with a random core. "
                    f"Provide the stage-1/core checkpoint or a full-tree "
                    f"brain_model_prior_last.")
            core_sd = ckpt_lib.load_ckpt(ckpt_dir, core_tag)["params"]
            if not (isinstance(core_sd, dict) and "core" in core_sd):
                core_sd = {"core": core_sd}  # stage-1 tags are core-shaped
            params = ckpt_lib.restore_into(params, core_sd)
            print(f"--- overlaid frozen core from {core_tag} ---")
        params = ckpt_lib.restore_into(params, lp)
        print("--- loaded brain_model_prior_last ---")
    elif os.path.exists(torch_ckpt):
        import torch
        from neurons_tpu.interop.torch_import import import_neurons_ensemble
        sd = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("model_state_dict", sd.get("state_dict", sd))
        imported, unused = import_neurons_ensemble(
            sd, n_blocks=bcfg.n_blocks, prior_depth=pcfg.depth,
            gpt2_layers=gcfg.n_layer)
        params = ckpt_lib.restore_into(params, imported)
        print(f"--- imported reference torch ensemble "
              f"({len(unused)} unused keys) ---")
    return params


def _load_data(args, bcfg, tcfg, train=True):
    from neurons_tpu.data import cc2017

    if args.synthetic:
        n = tcfg.num_train_samples if train else tcfg.num_test_samples
        return cc2017.synthetic_split(
            n=n, n_voxels=bcfg.voxel_counts[0], n_frames=6,
            img=32 if args.tiny else 224,
            txt_dim=bcfg.clip_txt_emb_dim, n_classes=51,
            seed=args.seed, train=train)
    return cc2017.load_split(args.root_dir, args.subj, train)


def cmd_train_brain(args):
    _setup(args)
    import numpy as np
    from neurons_tpu.config import MeshConfig
    from neurons_tpu.parallel import create_mesh
    from neurons_tpu.training.loop import run_stage1

    bcfg, _, _, tcfg = _configs(args)
    mesh = create_mesh(MeshConfig(data=-1))
    train_split = _load_data(args, bcfg, tcfg, train=True)
    test_split = _load_data(args, bcfg, tcfg, train=False)

    if args.synthetic:
        g = np.random.default_rng(args.seed)
        ct_train = g.normal(size=(len(train_split), 6, bcfg.clip_seq_dim,
                                  bcfg.clip_emb_dim)).astype(np.float32)
        ct_test = g.normal(size=(len(test_split), 6, bcfg.clip_seq_dim,
                                 bcfg.clip_emb_dim)).astype(np.float32)
    else:
        ct_train = np.load(os.path.join(
            args.root_dir, "clip_targets_train.npy"), mmap_mode="r")
        ct_test = np.load(os.path.join(
            args.root_dir, "clip_targets_test.npy"), mmap_mode="r")

    ckpt_dir = os.path.join(args.exp_dir, f"exp_{args.exp}", "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    run_stage1(bcfg, tcfg, mesh, train_split, test_split, ct_train, ct_test,
               ckpt_dir=ckpt_dir, resume=args.resume_from_ckpt,
               warm_start_params=_warm_start_overlay(args, bcfg))
    print("=== stage 1 finished ===")


def cmd_train_decoupler(args):
    _setup(args)
    from neurons_tpu.config import MeshConfig
    from neurons_tpu.models.gpt2 import GPT2Config, tiny_gpt2_config
    from neurons_tpu.parallel import create_mesh
    from neurons_tpu.training.loop import (run_stage2,
                                           synthetic_stage2_batch_builder)
    from neurons_tpu.utils import checkpoint as ckpt_lib

    bcfg, pcfg, dcfg, tcfg = _configs(args, stage2=True)
    gcfg = tiny_gpt2_config() if args.tiny else GPT2Config()
    mesh = create_mesh(MeshConfig(data=-1))
    train_split = _load_data(args, bcfg, tcfg, train=True)

    ckpt_dir = os.path.join(args.exp_dir, f"exp_{args.exp}", "checkpoints")
    # stage-1 core: best-metric `brain_model` preferred (the reference
    # loads brain_model.pth, train_neurons.py:219), else _last, else the
    # reference's torch artifact itself
    core_params = None
    for tag in ("brain_model", "brain_model_last"):
        if ckpt_lib.exists(ckpt_dir, tag):
            core_params = ckpt_lib.load_ckpt(ckpt_dir, tag)["params"]
            print(f"--- resuming core from {tag} ---")
            break
    torch_core = os.path.join(ckpt_dir, "brain_model.pth")
    if core_params is None and os.path.exists(torch_core):
        import torch
        from neurons_tpu.interop.torch_import import import_neurons_core
        sd = torch.load(torch_core, map_location="cpu", weights_only=False)
        sd = sd.get("model_state_dict", sd)
        core_params, unused = import_neurons_core(sd, n_blocks=bcfg.n_blocks)
        print(f"--- imported torch brain_model.pth core "
              f"({len(unused)} unused keys) ---")
    # warm-start layering, reference order (train_neurons.py:208-241):
    # MindEye2 backbone, then the stage-1 core over it, then the frozen
    # coco clipproj over everything
    warm = _warm_start_overlay(args, bcfg)
    if warm is not None:
        core_params = ckpt_lib.merge_overlays(
            warm, core_params,
            {"clipproj": warm["clipproj"]} if "clipproj" in warm else None)

    tables_exist = os.path.exists(
        os.path.join(args.root_dir, "clip_targets_train.npy"))
    if tables_exist and not args.synthetic:
        from neurons_tpu.training.loop import table_stage2_batch_builder
        builder = table_stage2_batch_builder(args.root_dir, dcfg,
                                             gcfg.vocab_size)
        print("--- using precomputed frozen-encoder tables ---")
    else:
        builder = synthetic_stage2_batch_builder(bcfg, dcfg, gcfg.vocab_size,
                                                 args.seed)
    # best-metric checkpoint gating needs the test split + CLIP table
    test_split = clip_targets_test = None
    ct_test_path = os.path.join(args.root_dir, "clip_targets_test.npy")
    if not args.synthetic and os.path.exists(ct_test_path):
        import numpy as np
        test_split = _load_data(args, bcfg, tcfg, train=False)
        clip_targets_test = np.load(ct_test_path, mmap_mode="r")
    os.makedirs(ckpt_dir, exist_ok=True)
    run_stage2(bcfg, pcfg, dcfg, tcfg, gcfg, mesh, train_split, builder,
               core_params=core_params, ckpt_dir=ckpt_dir,
               resume=args.resume_from_ckpt, test_split=test_split,
               clip_targets_test=clip_targets_test)
    print("=== stage 2 finished ===")


def cmd_recon(args):
    _setup(args)
    _apply_fast_preset(args, "recon")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neurons_tpu.config import SamplerConfig, UNet2DConfig, VAEConfig
    from neurons_tpu.models.gpt2 import tiny_gpt2_config, GPT2Config
    from neurons_tpu.models.neurons import NeuronsDecoupler
    from neurons_tpu.models.prior import prior_attn_bias
    from neurons_tpu.models.unet2d import UNetModel
    from neurons_tpu.models.vae import AutoencoderKL
    from neurons_tpu.pipelines import io
    from neurons_tpu.pipelines.keyframe import reconstruct_keyframes

    bcfg, pcfg, dcfg, tcfg = _configs(args, stage2=True)
    gcfg = tiny_gpt2_config() if args.tiny else GPT2Config()
    test_split = _load_data(args, bcfg, tcfg, train=False)

    if args.tiny:
        ucfg = UNet2DConfig(model_channels=8, channel_mult=(1, 2),
                            num_res_blocks=1, transformer_depth=(1, 1),
                            num_head_channels=4, context_dim=bcfg.clip_emb_dim,
                            adm_in_channels=1024, attention_resolutions=(2,))
        vcfg = VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                         norm_num_groups=4)
        scfg = SamplerConfig(unclip_steps=3, prior_steps=4)
        latent_hw = 8
    else:
        ucfg, vcfg, scfg, latent_hw = (UNet2DConfig(), VAEConfig(),
                                       SamplerConfig(), 96)

    key = jax.random.PRNGKey(args.seed)
    model = NeuronsDecoupler(bcfg, pcfg, dcfg, gcfg)
    voxel0 = jnp.zeros((1, 1, bcfg.voxel_counts[0]))
    if args.synthetic and not args.tiny:
        # full-size synthetic: host-filled shapes, not a device init —
        # a real init of the 2.2B ensemble compiles minutes of XLA and
        # doubles HBM transiently (utils/synth_init.py)
        from neurons_tpu.utils.synth_init import synth_params
        dec_params = synth_params(
            lambda: model.init(key, voxel0,
                               jnp.zeros((1, 8), jnp.int32))["params"],
            seed=args.seed)
    else:
        dec_params = model.init(key, voxel0,
                                jnp.zeros((1, 8), jnp.int32))["params"]

    dec_params = _load_decoupler_params(args, dec_params, bcfg, pcfg, gcfg)

    unet = UNetModel(ucfg)
    vae = AutoencoderKL(vcfg)
    unclip_ckpt = os.path.join(args.weights_dir,
                               "unclip6_epoch0_step110000.ckpt")
    if os.path.exists(unclip_ckpt):
        # the reference's released unclip engine (README.md:89), EMA-swapped
        from neurons_tpu.interop.load_weights import load_unclip_engine
        up, vp, rep = load_unclip_engine(unclip_ckpt, ucfg, vcfg)
        unet_params, vae_params = up, {"params": vp}
        print(f"--- loaded unclip engine ({rep.get('ema_swapped', 0)} EMA "
              f"tensors swapped, {len(rep['unet_unused'])} unused) ---")
    else:
        if not (args.tiny or args.synthetic):
            raise FileNotFoundError(f"{unclip_ckpt} missing")
        x0 = jnp.zeros((1, 4, latent_hw, latent_hw))
        img_hw = latent_hw * 2 ** (len(vcfg.block_out_channels) - 1)

        def _unet_init():
            return unet.init(key, x0, jnp.zeros((1,)),
                             jnp.zeros((1, bcfg.clip_seq_dim,
                                        bcfg.clip_emb_dim)),
                             jnp.zeros((1, ucfg.adm_in_channels))
                             )["params"]

        def _vae_init():
            return vae.init(key, jnp.zeros((1, 3, img_hw, img_hw)))

        if args.synthetic and not args.tiny:
            from neurons_tpu.utils.synth_init import synth_params
            unet_params = synth_params(_unet_init, seed=args.seed + 1)
            vae_params = synth_params(_vae_init, seed=args.seed + 2)
        else:
            unet_params, vae_params = _unet_init(), _vae_init()

    # module compute dtype (bf16 at full size — f32 activations at
    # production batches exceed the 16 GB v5e HBM; sampler math f32)
    dt = _stage_dtype(args)
    ci, co = _boundary_casts(dt)
    dec_params = _cast_host_tree(dec_params, dt)
    unet_params = _cast_host_tree(unet_params, dt)
    vae_params = _cast_host_tree(vae_params, dt)

    def dec_apply(p, method, *a, **kw):
        a = [ci(x) for x in a]
        kw = {kk: ci(v) for kk, v in kw.items()}
        return jax.tree_util.tree_map(
            co, model.apply({"params": p}, *a, method=method, **kw))

    # class-name CLIP text embeds: precomputed table if present
    # (neurons precompute -> class_text_embeds.npy), random in smoke mode
    class_table = os.path.join(args.root_dir, "class_text_embeds.npy")
    if os.path.exists(class_table):
        class_embeds = jnp.asarray(np.load(class_table), jnp.float32)
        print("--- using precomputed class text embeds ---")
    else:
        if not (args.tiny or args.synthetic):
            raise FileNotFoundError(
                f"{class_table} missing; run `neurons precompute` first")
        class_embeds = jnp.asarray(np.random.default_rng(0).normal(
            size=(dcfg.num_classes, dcfg.clip_txt_emb_dim)
        ).astype(np.float32))

    from neurons_tpu.ops.resize import resize_reference

    n_total = _test_clip_count(args, test_split.voxel.shape[0])
    bs = 4 if (args.tiny or args.synthetic) else args.batch_size
    bs = max(1, min(bs, n_total))
    f = dcfg.n_frames

    # ONE jitted per-batch program reused across the whole split (the
    # reference batches stage 3 the same way: batch 20 over 1200 clips,
    # recon_keyframe_neurons.py:350). The artifact-dialect resizes run
    # on-device inside it; eager per-batch calls would re-trace the
    # sampler scans every iteration.
    import functools

    @functools.partial(jax.jit, donate_argnums=(4,))  # voxel buffer
    def _run_batch(dec_p, unet_p, vae_p, k, voxel):
        def unet_apply(p, x, t, ca, v, **kw):
            out = unet.apply({"params": p}, ci(x), t, ci(ca), ci(v),
                             **{kk: ci(vv) for kk, vv in kw.items()})
            return jax.tree_util.tree_map(co, out)

        def vae_decode(z):
            return co(vae.apply(vae_p, ci(z), method=AutoencoderKL.decode))

        out = reconstruct_keyframes(
            decoupler_apply=dec_apply, decoupler_params=dec_p,
            unet_apply=unet_apply,
            unet_params=unet_p,
            vae_decode=vae_decode,
            key=k, voxel=voxel, class_text_embeds=class_embeds,
            sampler_cfg=scfg, n_frames=f, latent_hw=latent_hw,
            enhance=args.enhance, caption_len=12 if args.tiny else 60,
            # f32 bias math on the traced params; XLA DCEs all but the
            # bias table's cast (bench.py does the same)
            prior_bias=prior_attn_bias(
                jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), dec_p["prior_net"]),
                pcfg.num_tokens).astype(dt),
            sampler_opts=dict(
                tgate_step=getattr(args, "tgate", 0),
                tgate_pab=getattr(args, "tgate_pab", 0),
                encoder_reuse=getattr(args, "encoder_reuse", 1),
                pab=_parse_ints(getattr(args, "pab", None)),
                pab_range=_parse_ints(getattr(args, "pab_range", None)),
                deep_cache=getattr(args, "deep_cache", 0)))
        # blurry latents -> pixel video: the artifact contract is pixel
        # space (reference recon_keyframe_neurons.py:323-333; stage 5
        # consumes pixels). lax.map bounds the decoder peaks per frame.
        blurry_px = jax.lax.map(lambda zi: vae_decode(zi[None])[0],
                                out.blurry_latents)
        blurry_px = jnp.clip(blurry_px / 2 + 0.5, 0.0, 1.0)
        blurry_px = blurry_px.reshape(voxel.shape[0], f,
                                      *blurry_px.shape[1:])
        recons = out.keyframes
        if not args.tiny:
            # reference resizes recons to 256 before saving (recon_
            # keyframe_neurons.py:444-445, transforms.Resize on a tensor
            # under torchvision 0.16 = bilinear WITHOUT antialias —
            # ops/resize.py) and stores blurry at 224 (stage 5 reshapes
            # recon_videos.pt as [1200*6, 3, 224, 224])
            recons = resize_reference(recons, (256, 256))
            if blurry_px.shape[-1] != 224:
                blurry_px = resize_reference(blurry_px, (224, 224))
        return recons, blurry_px, out.captions

    all_recons, all_blurry, all_caps = [], [], []
    marks = []
    t0 = _loop_start("3")

    def _dispatch3(i):
        vox = np.asarray(test_split.voxel[i:i + bs, :1], np.float32)
        pad = bs - vox.shape[0]
        if pad:  # fixed shapes keep the jit cache hot on the last batch
            vox = np.concatenate([vox, np.repeat(vox[-1:], pad, 0)])
        return _run_batch(dec_params, unet_params, vae_params,
                          jax.random.fold_in(key, i),
                          jnp.asarray(vox)), pad

    def _materialize3(i, outs, pad):
        (recons, blurry_px, caps), fetch_s = _fetch_retry(
            "3",
            lambda: tuple(np.asarray(x) for x in outs),
            lambda: tuple(np.asarray(x) for x in _dispatch3(i)[0]))
        k = bs - pad
        all_recons.append(recons[:k])
        all_blurry.append(blurry_px[:k])
        all_caps.extend(
            f"tokens:{list(map(int, c[:8]))}" for c in caps[:k])
        done = min(i + bs, n_total)
        el = _time.perf_counter() - t0
        _watchdog("3", marks, done, el, fetch_s=fetch_s, probe=outs[0])
        marks.append((done, el))
        print(f"--- stage 3: {done}/{n_total} clips "
              f"({el / done:.2f} s/clip) ---", flush=True)

    # dispatch-ahead (see stage 5): the ~18 MB/batch D2H of recon +
    # blurry pixels rides the tunnel while the device runs batch i+1
    pending = None
    for i in range(0, n_total, bs):
        nxt = (i, *_dispatch3(i))
        if pending is not None:
            _materialize3(*pending)
        pending = nxt
    if pending is not None:
        _materialize3(*pending)
    _record_steady("3", marks, bs, t0)

    out_dir = io.stage3_dir(args.exp_dir, args.exp, args.subj, args.enhance)
    io.save_stage3_artifacts(
        out_dir, args.subj, all_recons=np.concatenate(all_recons, 0),
        all_gts=np.asarray(test_split.images[:n_total, 2]),
        captions=all_caps,
        blurry_videos=np.concatenate(all_blurry, 0))
    print(f"=== stage 3 finished -> {out_dir} ===")


def cmd_caption(args):
    """Stage 4: BLIP-2 captions for the stage-3 keyframes (reference
    caption_keyframe.py:23-48; enhance variant differs only in paths)."""
    _setup(args)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neurons_tpu.models.blip2 import Blip2Captioner, Blip2Config
    from neurons_tpu.pipelines import io

    cfg = Blip2Config.tiny() if args.tiny else Blip2Config()
    model = Blip2Captioner(cfg)
    hw = cfg.vision.image_size

    st3 = io.stage3_dir(args.exp_dir, args.exp, args.subj, args.enhance)
    try:
        art = io.load_stage3_artifacts(st3, args.subj)
        imgs = np.asarray(art["all_recons"], np.float32)
    except FileNotFoundError:
        if not args.synthetic:
            raise
        imgs = np.random.default_rng(args.seed).uniform(
            size=(4, 3, hw, hw)).astype(np.float32)
    # whole-split images stay HOST numpy (1200 clips x 256px is ~1 GB;
    # resizing them on device kept a whole-split buffer resident next to
    # the 3.74B-param model) — resize + CLIP-normalize per batch below
    mean = jnp.array([0.48145466, 0.4578275, 0.40821073])[:, None, None]
    std = jnp.array([0.26862954, 0.26130258, 0.27577711])[:, None, None]

    def _prep(chunk):  # [b, 3, H, W] host -> normalized [b, 3, hw, hw]
        x = jnp.asarray(chunk, jnp.float32)
        if x.shape[-2:] != (hw, hw):
            x = jax.image.resize(x, (x.shape[0], 3, hw, hw), "linear")
        return (x - mean[None]) / std[None]

    key = jax.random.PRNGKey(args.seed)
    wfile = os.path.join(args.weights_dir, "blip2-opt.pt")
    if os.path.exists(wfile):
        import torch
        from neurons_tpu.interop.torch_import import import_blip2
        sd = torch.load(wfile, map_location="cpu")
        params, unused = import_blip2(sd.get("state_dict", sd), cfg)
        if unused:
            print(f"--- blip2 import: {len(unused)} unused keys ---")
    else:
        if not (args.tiny or args.synthetic):
            raise FileNotFoundError(
                f"{wfile} not found; run with --tiny/--synthetic or place "
                "the HF blip2-opt state dict there")
        if args.synthetic and not args.tiny:
            # 3.74B params: host-filled, never a 15 GB f32 device init
            from neurons_tpu.utils.synth_init import synth_params
            params = synth_params(
                lambda: model.init(key, _prep(imgs[:1]),
                                   jnp.zeros((1, 2), jnp.int32))["params"],
                seed=args.seed)
        else:
            params = model.init(key, _prep(imgs[:1]),
                                jnp.zeros((1, 2), jnp.int32))["params"]

    # module compute dtype (bf16 at full size like stages 3/5: halves
    # the 3.74B params' HBM residency and weight traffic in the
    # KV-cached decode, which is weight-streaming-bound); greedy argmax
    # tolerates bf16 logits, and parity tests pin the f32 tiny path
    dt = _stage_dtype(args)
    ci, _ = _boundary_casts(dt)
    params = _cast_host_tree(params, dt)

    max_len = 8 if args.tiny else 30
    gen = jax.jit(lambda p, x: model.apply({"params": p}, ci(x),
                                           max_len=max_len,
                                           method=Blip2Captioner.generate))
    toks = []
    bs = 8
    t0 = _loop_start("4")
    marks = []
    n_imgs = imgs.shape[0]
    for i in range(0, n_imgs, bs):
        chunk = imgs[i:i + bs]
        pad = bs - chunk.shape[0]
        if pad:  # fixed shapes: a ragged tail would recompile generate
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, 0)], 0)
        toks.append(np.asarray(gen(params, _prep(chunk)))[:bs - pad])
        done = min(i + bs, n_imgs)
        el = _time.perf_counter() - t0
        _watchdog("4", marks, done, el)
        marks.append((done, el))
        if done % 64 < bs or done == n_imgs:
            print(f"--- stage 4: {done}/{n_imgs} clips "
                  f"({marks[-1][1] / done:.2f} s/clip) ---", flush=True)
    toks = np.concatenate(toks, 0)
    _record_steady("4", marks, bs, t0)

    captions = []
    try:  # decode with the OPT tokenizer when its files are cached
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained("facebook/opt-2.7b",
                                            local_files_only=True)
        captions = [tok.decode(t, skip_special_tokens=True).strip()
                    for t in toks]
    except Exception:
        # no cached OPT tokenizer: raw ids would silently poison the
        # stage-5/6 caption artifact — refuse unless explicitly allowed
        if not (args.tiny or args.synthetic
                or getattr(args, "allow_raw_token_captions", False)):
            raise RuntimeError(
                "facebook/opt-2.7b tokenizer not cached: captions cannot "
                "be decoded to text. Cache the tokenizer or pass "
                "--allow_raw_token_captions to write raw 'ids:...' "
                "strings (stage 5/6 will consume them as prompts).")
        print("WARNING: no OPT tokenizer — writing raw token-id captions")
        captions = ["ids:" + ",".join(map(str, t)) for t in toks]

    io.save_caption_artifact(st3, captions)
    print(f"=== stage 4 finished -> {st3}/pred_test_caption.pt ===")


def cmd_video(args):
    _setup(args)
    _apply_fast_preset(args, "video")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neurons_tpu.config import UNet3DConfig, VAEConfig
    from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
    from neurons_tpu.models.unet3d import UNet3DModel
    from neurons_tpu.models.vae import AutoencoderKL
    from neurons_tpu.ops.resize import resize_np
    from neurons_tpu.pipelines import io
    from neurons_tpu.pipelines.video import reconstruct_video

    if args.tiny:
        u3 = UNet3DConfig(block_out_channels=(8, 16, 16, 16),
                          layers_per_block=1, cross_attention_dim=12,
                          attention_head_dim=4, norm_num_groups=4,
                          motion_num_attention_heads=2,
                          motion_max_seq_length=8)
        vcfg = VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                         norm_num_groups=4)
        n_frames, steps, hw = 4, 3, 16
    else:
        u3, vcfg = UNet3DConfig(), VAEConfig()
        n_frames, steps, hw = 16, 25, 256

    key = jax.random.PRNGKey(args.seed)
    lat_hw = hw // 2 ** (len(vcfg.block_out_channels) - 1)
    unet = UNet3DModel(u3, n_frames=n_frames)
    ctx_dim = u3.cross_attention_dim
    x0 = jnp.zeros((1, 4, n_frames, lat_hw, lat_hw))
    ctx0 = jnp.zeros((1, 5 if args.tiny else 77, ctx_dim))
    cn = SparseControlNetModel(u3, n_frames=n_frames)
    vae = AutoencoderKL(vcfg)

    # the reference's stage-5 weight bundle (configs/NeuroClips/
    # control.yaml:1-23): DreamBooth base + motion module + adapter LoRA
    # + SparseCtrl ckpt
    w = lambda f: os.path.join(args.weights_dir, f)
    mm_path = w("v3_sd15_mm.ckpt")
    if os.path.exists(mm_path):
        from neurons_tpu.interop.load_weights import (
            load_animatediff_unet3d, load_sd_vae, load_sparse_controlnet)
        base = w("realisticVisionV60B1_v51VAE.safetensors")
        if not os.path.exists(base):
            base = w("sd-v1-5.ckpt")
        lora = w("v3_sd15_adapter.ckpt")
        uparams, rep = load_animatediff_unet3d(
            base, mm_path, u3,
            lora_path=lora if os.path.exists(lora) else None)
        print(f"--- loaded AnimateDiff UNet3D "
              f"({len(rep['spatial_unused'])}+{len(rep['motion_unused'])} "
              f"unused) ---")
        cparams, _ = load_sparse_controlnet(
            w("v3_sd15_sparsectrl_rgb.ckpt"), u3)
        vparams_p, _ = load_sd_vae(base, vcfg)
        vparams = {"params": vparams_p}
    else:
        if not (args.tiny or args.synthetic):
            raise FileNotFoundError(f"{mm_path} missing")

        def _u_init():
            return unet.init(key, x0, jnp.zeros((1,)), ctx0)["params"]

        def _c_init():
            return cn.init(key, x0, jnp.zeros((1,)), ctx0,
                           jnp.zeros((1, 4, n_frames, lat_hw, lat_hw)),
                           jnp.zeros((1, 1, n_frames, lat_hw, lat_hw))
                           )["params"]

        def _v_init():
            return vae.init(key, jnp.zeros((1, 3, hw, hw)))

        if args.synthetic and not args.tiny:
            # host-filled shapes (utils/synth_init.py); NOTE: this also
            # randomizes the module's zero-init conv_out / motion
            # proj_out heads, which is what a synthetic DRIVE wants — a
            # zero-eps UNet3D makes the sampler comparison vacuous
            # (verify-skill gotcha)
            from neurons_tpu.utils.synth_init import synth_params
            uparams = synth_params(_u_init, seed=args.seed + 3)
            cparams = synth_params(_c_init, seed=args.seed + 4)
            vparams = synth_params(_v_init, seed=args.seed + 5)
        else:
            uparams, cparams, vparams = _u_init(), _c_init(), _v_init()

    # module compute dtype (see --dtype; reference stage 5 runs fp16,
    # scripts/neuroclips_video.py:212-215)
    dt = _stage_dtype(args)
    ci, co = _boundary_casts(dt)
    uparams = _cast_host_tree(uparams, dt)
    cparams = _cast_host_tree(cparams, dt)
    vparams = _cast_host_tree(vparams, dt)

    # stage-3 artifacts (blurry videos + keyframes); synthetic fallback
    st3 = io.stage3_dir(args.exp_dir, args.exp, args.subj, args.enhance)
    g = np.random.default_rng(args.seed)
    # round-robin clip scattering: this process handles clips
    # shard, shard+num_shards, ... (reference org_idx = rank + i * N)
    shard, num_shards = args.shard, args.num_shards
    if num_shards == 1 and jax.process_count() > 1:
        # launched inside a process group without explicit --shard:
        # take the rank split automatically, the reference's
        # `accelerate launch` semantics (scripts/neuroclips_video.py:
        # 39-40 rank = Accelerator().process_index)
        shard, num_shards = jax.process_index(), jax.process_count()
        print(f"--- stage 5: rank-scattered clips "
              f"{shard}::{num_shards} (process group) ---", flush=True)
    blurry = None
    try:
        art = io.load_stage3_artifacts(
            st3, args.subj, caption_mode=getattr(args, "caption_mode",
                                                 "auto"))
        sel = np.arange(shard, len(art["all_recons"]), num_shards)
        if args.tiny:
            sel = sel[:2]
        elif getattr(args, "n_test", 0):
            sel = sel[:args.n_test]
        # HOST residency: the full split's recons are 8.5 GB f32 at 1200
        # clips x 768px — whole-split arrays stay numpy, only per-batch
        # slices reach the device (the first full-split drive OOM'd the
        # 16 GB chip exactly here)
        keyframes = np.asarray(art["all_recons"][sel], np.float32)
        # GT video source preference: the dataset's GT_test_3fps.pt
        # (what the reference composites into the GIFs,
        # scripts/neuroclips_video.py:197-204); else the stage-3 GT
        # keyframes (which may be single frames -> add a frame axis)
        gts = None
        gt_vid = os.path.join(args.root_dir, "GT_test_3fps.pt")
        if os.path.exists(gt_vid):
            import torch
            gv = torch.load(gt_vid, map_location="cpu",
                            weights_only=False).float().numpy()
            if gv.ndim == 5 and gv.shape[1] == 3 and gv.shape[2] != 3:
                gv = gv.transpose(0, 2, 1, 3, 4)  # [N,3,F,H,W]->[N,F,3,H,W]
            gts = gv[sel]
        if gts is None and art["all_gts"] is not None:
            gts = art["all_gts"][sel]
            if gts.ndim == 4:           # [N, 3, H, W] single-frame GTs
                gts = gts[:, None]
        bv = art["blurry_videos"]
        if bv.ndim == 5 and bv.shape[2] == 3:  # pixel video [N, F, 3, H, W]
            blurry = np.asarray(bv[sel], np.float32)  # host; 5.7 GB at
            # 1200 clips — per-batch slices resize on device below
    except FileNotFoundError:
        if not args.synthetic:
            raise
        keyframes, gts, sel = None, None, np.arange(2)
    if keyframes is None or keyframes.ndim != 4:
        keyframes = g.uniform(size=(2, 3, hw, hw)).astype(np.float32)
        gts = None
    if gts is None:
        if not (args.tiny or args.synthetic):
            raise RuntimeError(
                f"no GT source: neither {args.root_dir}/GT_test_3fps.pt "
                f"nor stage-3 all_gts found")
        gts = g.uniform(size=(int(keyframes.shape[0]), 6, 3, hw, hw)
                        ).astype(np.float32)
    if blurry is None:
        if not (args.tiny or args.synthetic):
            raise RuntimeError(
                "stage-3 blurry videos missing/malformed in "
                f"{st3}/recon_videos.pt — rerun stage 3")
        blurry = g.uniform(size=(int(keyframes.shape[0]), 6, 3, hw, hw)
                           ).astype(np.float32)

    # caption embeddings: the reference embeds the stage-3/4 captions with
    # the SD-1.5 CLIP text encoder (scripts/neuroclips_video.py:95-117 +
    # :254-260); here via our CLIPTextTower with weights from the base ckpt
    text = None
    base = os.path.join(args.weights_dir,
                        "realisticVisionV60B1_v51VAE.safetensors")
    if not os.path.exists(base):
        base = os.path.join(args.weights_dir, "sd-v1-5.ckpt")
    try:
        captions = art.get("captions", []) if not args.synthetic else []
    except NameError:
        captions = []
    if captions and os.path.exists(base) and not args.tiny:
        from neurons_tpu.data.clip_tokenizer import tokenize
        from neurons_tpu.interop.load_weights import load_sd_text_encoder
        from neurons_tpu.models.clip import CLIPTextConfig, CLIPTextTower
        tcfg_clip = CLIPTextConfig.sd15()
        tparams, _ = load_sd_text_encoder(base, tcfg_clip.layers)
        tower = CLIPTextTower(tcfg_clip)
        # SD's text encoder has no text_projection; overlay the imported
        # weights onto an init tree (the unused pooled path keeps its init)
        from neurons_tpu.utils.checkpoint import restore_into
        init_p = tower.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        tparams = restore_into(init_p, tparams)
        toks = np.zeros((len(sel), 77), np.int32)
        for i, c in enumerate([captions[int(s)] for s in sel]):
            t = tokenize([c], context_length=77)[0]
            toks[i, :len(t)] = t
        # chunked encode, host-collected: a single 1200x77 forward keeps
        # multi-GB activations on device alongside the UNet3D stack
        chunks = []
        for s in range(0, len(toks), 128):
            last, _ = tower.apply({"params": tparams},
                                  jnp.asarray(toks[s:s + 128]))
            chunks.append(np.asarray(last, np.float32))
        text = np.concatenate(chunks, 0)
        print("--- caption text embeddings from SD CLIP text encoder ---")
    if text is None:
        text = (g.normal(size=(int(keyframes.shape[0]), ctx0.shape[1],
                               ctx_dim)) * 0.1).astype(np.float32)

    # ONE jitted per-batch denoise program, looped over the clip set.
    # Per-clip compute already saturates the chip (CLAUDE.md: batch 2
    # measured 9.6 s/clip vs 5.75 at batch 1), so full-size default is
    # batch 1; smoke modes batch 2 (matches the tiny artifact count).
    import functools
    import time as _time

    @functools.partial(jax.jit, donate_argnums=(4, 5))
    def _run_batch(up, cp, vp, k, blur, kf, txt):
        def u3(p, x, t, c, down, mid, **kw):
            out = unet.apply({"params": p}, ci(x), t, ci(c), down, mid,
                             **{kk: ci(vv) for kk, vv in kw.items()})
            return jax.tree_util.tree_map(co, out)

        def cna(p, x, t, c, cond, mask, s):
            return cn.apply({"params": p}, ci(x), t, ci(c), ci(cond),
                            ci(mask), s)

        out = reconstruct_video(
            unet3d_apply=u3,
            unet3d_params=up,
            controlnet_apply=cna,
            controlnet_params=cp,
            vae_encode_mode=lambda x: co(vae.apply(
                vp, ci(x), method=AutoencoderKL.encode).mode()),
            vae_decode=lambda z: co(vae.apply(
                vp, ci(z), method=AutoencoderKL.decode)),
            key=k, blurry_video=blur, keyframe=kf,
            text_embeddings=txt, uncond_embeddings=jnp.zeros_like(txt),
            num_steps=steps, n_frames=n_frames,
            tgate_step=getattr(args, "tgate", 0),
            tgate_pab=getattr(args, "tgate_pab", 0),
            encoder_reuse=getattr(args, "encoder_reuse", 1),
            pab=_parse_ints(getattr(args, "pab", None)),
            pab_range=_parse_ints(getattr(args, "pab_range", None)))
        return out.video

    mode = "enhance" if args.enhance else "motion"
    out_dir = io.video_dir(args.exp_dir, args.exp, args.subj, mode)
    os.makedirs(out_dir, exist_ok=True)
    n_sel = int(keyframes.shape[0])
    # batch 1 at full size: the 50-clip drive measured batch-2 DDIM at
    # 3.64 s/clip steady vs bench's 2.76 at batch 1 (per-clip compute
    # saturates the chip); tiny smoke keeps batch 2 (one compile)
    vb = 2 if args.tiny else 1
    vb = max(1, min(vb, n_sel))
    from concurrent.futures import ThreadPoolExecutor
    _gif_pool = ThreadPoolExecutor(max_workers=2, thread_name_prefix="gif")
    gts = np.asarray(gts)
    marks = []
    t0 = _loop_start("5")

    def _dispatch(i):
        """Enqueue batch i's device work; returns the async result.
        Whole-split tensors are HOST numpy; only this batch's slice is
        shipped + resized on device (fixed shapes: one jit entry)."""
        sl = slice(i, i + vb)
        blur_b = jnp.asarray(blurry[sl], jnp.float32)
        if blur_b.shape[-2:] != (hw, hw):
            blur_b = jax.image.resize(
                blur_b, blur_b.shape[:3] + (hw, hw), "linear")
        kf_b = jnp.asarray(keyframes[sl], jnp.float32)
        if kf_b.shape[-2:] != (hw, hw):
            kf_b = jax.image.resize(
                kf_b, (kf_b.shape[0], 3, hw, hw), "linear")
        txt_b = jnp.asarray(text[sl], jnp.float32)
        pad = vb - kf_b.shape[0]
        if pad:  # fixed shapes keep the jit cache hot on the last batch
            rep = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, 0)], 0)
            blur_b, kf_b, txt_b = rep(blur_b), rep(kf_b), rep(txt_b)
        return _run_batch(uparams, cparams, vparams,
                          jax.random.fold_in(key, i),
                          blur_b, kf_b, txt_b), pad

    def _materialize(i, video_dev, pad):
        """Block on batch i's result and do the host-side composition.
        Runs while the device crunches batch i+1 (dispatch-ahead)."""
        video, fetch_s = _fetch_retry(
            "5",
            lambda: np.asarray(video_dev),
            lambda: np.asarray(_dispatch(i)[0]))
        video = video[:vb - pad]
        if not args.tiny:
            # the reference's saved-GIF frame dialect: drop the first 4
            # frames, then every other — 16 -> 6 frames, matching the
            # 6-frame 3fps GT row (scripts/neuroclips_video.py:43-45,325)
            video = video[:, 4:][:, ::2]
        for j in range(video.shape[0]):
            gt_i = gts[min(i + j, len(gts) - 1)][:video.shape[1]]
            if gt_i.shape[0] < video.shape[1]:
                reps = -(-video.shape[1] // gt_i.shape[0])
                gt_i = np.tile(gt_i, (reps, 1, 1, 1))[:video.shape[1]]
            # host resize (same bilinear taps as the device path): the
            # 224-px GT row vs 256-px video makes this fire on EVERY
            # production clip — a device call here cost a tunnel
            # round-trip per clip serialized against the DDIM scan
            gt_i = resize_np(np.asarray(gt_i, np.float32),
                             (video.shape[3], video.shape[4]))
            side = np.concatenate([gt_i[None], video[j][None]], axis=-1)
            org_idx = int(sel[i + j]) if i + j < len(sel) else i + j
            prompt = str(captions[org_idx]) if len(captions) > org_idx \
                else ""
            # overlap the GIF quantize+encode with the next batch's
            # device work (one writer keeps disk order deterministic)
            _gif_pool.submit(io.save_video_grid, side, os.path.join(
                out_dir, io.gif_artifact_name(org_idx, prompt)))
        done = min(i + vb, n_sel)
        el = _time.perf_counter() - t0
        _watchdog("5", marks, done, el, fetch_s=fetch_s, probe=video_dev)
        marks.append((done, el))
        print(f"--- stage 5: {done}/{n_sel} clips "
              f"({el / done:.2f} s/clip) ---", flush=True)

    # double-buffered drive: dispatch batch i+1 BEFORE materializing
    # batch i, so D2H + GT compose + GIF submit of i overlap the DDIM
    # scan of i+1 (JAX async dispatch; the two in-flight video buffers
    # are ~13 MB each). The 1200-clip r4 drive measured ~1.1 s/clip of
    # host-side time serialized against ~2.9 s of device time here.
    # Per-phase accounting (VERDICT r4 item 5: decompose the
    # drive-vs-bench gap): `dispatch` = enqueue + eager pre-ops
    # (artifact slice to device, resizes), `fetch` = blocked in the
    # batch-result D2H, `compose` = host GT compose + GIF submit.
    phases = {"dispatch": [], "fetch": [], "compose": []}
    _mat0 = _materialize

    def _materialize(i, video_dev, pad):  # noqa: F811 — timing shim
        tm0 = _time.perf_counter()
        _mat0(i, video_dev, pad)
        tot = _time.perf_counter() - tm0
        f = _LAST_FETCH_S.pop("5", 0.0)
        phases["fetch"].append(f)
        phases["compose"].append(tot - f)

    pending = None
    for i in range(0, n_sel, vb):
        td0 = _time.perf_counter()
        nxt = (i, *_dispatch(i))
        phases["dispatch"].append(_time.perf_counter() - td0)
        if pending is not None:
            _materialize(*pending)
        pending = nxt
    if pending is not None:
        _materialize(*pending)
    _gif_pool.shutdown(wait=True)  # all GIFs on disk before stage 6
    _record_steady("5", marks, vb, t0)
    if len(phases["fetch"]) > 1:  # steady phases: drop the compile batch
        _STAGE_STATS["5"]["phase_s_per_batch"] = {
            k: round(sum(v[1:]) / len(v[1:]), 3)
            for k, v in phases.items() if len(v) > 1}
    print(f"=== stage 5 finished -> {out_dir} ===")


def cmd_decoupled_eval(args):
    _setup(args)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neurons_tpu.models.gpt2 import GPT2Config, tiny_gpt2_config
    from neurons_tpu.models.neurons import NeuronsDecoupler
    from neurons_tpu.pipelines.decoupled_eval import generate_decoupled_outputs
    from neurons_tpu.utils import checkpoint as ckpt_lib

    bcfg, pcfg, dcfg, tcfg = _configs(args, stage2=True)
    gcfg = tiny_gpt2_config() if args.tiny else GPT2Config()
    test_split = _load_data(args, bcfg, tcfg, train=False)

    key = jax.random.PRNGKey(args.seed)
    model = NeuronsDecoupler(bcfg, pcfg, dcfg, gcfg)
    voxel0 = jnp.zeros((1, 1, bcfg.voxel_counts[0]))
    params = model.init(key, voxel0, jnp.zeros((1, 8), jnp.int32))["params"]
    params = _load_decoupler_params(args, params, bcfg, pcfg, gcfg)

    bs = 4 if (args.tiny or args.synthetic) else args.batch_size
    # stage-e compares against the TEST set's GT masks (reference
    # gen_decoupled_outputs.py:228-231); synthetic splits carry masks only
    # on the train side, so smoke mode borrows those stand-ins
    gt_masks = test_split.key_obj_masks
    if gt_masks is None:
        if not (args.tiny or args.synthetic):
            raise FileNotFoundError(
                "masks/key_objects_masks_qwen_test.pt missing — stage-e "
                "needs the test GT masks")
        gt_masks = _load_data(args, bcfg, tcfg, train=True).key_obj_masks
    g = np.random.default_rng(0)
    class_table = os.path.join(args.root_dir, "class_text_embeds.npy")
    if os.path.exists(class_table):
        class_embeds = jnp.asarray(np.load(class_table), jnp.float32)
    else:
        class_embeds = jnp.asarray(g.normal(
            size=(dcfg.num_classes, dcfg.clip_txt_emb_dim)
        ).astype(np.float32))
    out = generate_decoupled_outputs(
        decoupler_apply=lambda p, m, *a, **kw: model.apply(
            {"params": p}, *a, method=m, **kw),
        decoupler_params=params, key=key,
        voxel=jnp.asarray(test_split.voxel[:bs, :1], jnp.float32),
        class_text_embeds=class_embeds, n_frames=dcfg.n_frames,
        prior_steps=4 if args.tiny else 100,
        caption_len=12 if args.tiny else 60,
        gt_masks=jnp.asarray(gt_masks[:bs, :dcfg.n_frames]),
        gt_cls=jnp.asarray(test_split.cls_label[:bs]))
    print(f"Dice: {float(out.dice):.4f}")
    print(f"cls accuracy: {float(out.cls_accuracy):.4f} "
          f"precision: {float(out.cls_precision):.4f} "
          f"recall: {float(out.cls_recall):.4f}")
    print("=== stage e finished ===")


def cmd_eval(args):
    _setup(args)
    from neurons_tpu.evaluation.runner import run_metrics
    from neurons_tpu.pipelines import io

    from neurons_tpu.evaluation.runner import build_metric_classifiers

    # mode must match what stage 5 wrote (mode mismatch crashed
    # default-flag pipelines before)
    mode = args.mode or ("enhance" if getattr(args, "enhance", False)
                         else "motion")
    data_path = io.video_dir(args.exp_dir, args.exp, args.subj, mode)
    n_frames = 6
    gifs = sorted(f for f in os.listdir(data_path)
                  if f.endswith(".gif")) if os.path.isdir(data_path) else []
    if gifs:
        n_frames = io.load_gif(os.path.join(data_path, gifs[0])).shape[0]
    classifiers = build_metric_classifiers(args.weights_dir,
                                           num_frames=n_frames)
    if classifiers is not None:
        print("--- semantic metrics enabled (imported classifiers) ---")
    report = run_metrics(data_path, classifiers=classifiers)
    out = os.path.join(io.exp_dir(args.exp_dir, args.exp, args.subj),
                       f"metrics_{mode}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"=== stage 6 finished -> {out} ===")


def cmd_precompute(args):
    """Build the frozen-encoder tables stage-1/2 training streams from
    disk (see data/precompute.py; replaces the reference's in-loop frozen
    CLIP/VAE forwards, train_neurons.py:400,498-499)."""
    _setup(args)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neurons_tpu.config import VAEConfig
    from neurons_tpu.data import precompute as pc
    from neurons_tpu.data.clip_tokenizer import tokenize
    from neurons_tpu.models.clip import (CLIPTextConfig, CLIPTextTower,
                                         CLIPVisionConfig, CLIPVisionTower,
                                         preprocess_images)
    from neurons_tpu.models.vae import AutoencoderKL

    bcfg, _, _, tcfg = _configs(args)
    key = jax.random.PRNGKey(args.seed)

    if args.tiny:
        vc, tc = CLIPVisionConfig.tiny(), CLIPTextConfig.tiny()
        vcfg = VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                         norm_num_groups=4)
    else:
        vc, tc, vcfg = (CLIPVisionConfig.bigG(), CLIPTextConfig.bigG(),
                        VAEConfig())
    vision = CLIPVisionTower(vc)
    text = CLIPTextTower(tc)
    vae = AutoencoderKL(vcfg)

    wfile = os.path.join(args.weights_dir, "open_clip_bigG.pt")
    img_hw = vc.image_size
    if os.path.exists(wfile):
        import torch
        from neurons_tpu.interop.torch_import import (import_open_clip_text,
                                                      import_open_clip_vision)
        sd = torch.load(wfile, map_location="cpu")
        sd = sd.get("state_dict", sd)
        vparams, _ = import_open_clip_vision(sd, vc.layers)
        tparams, _ = import_open_clip_text(sd, tc.layers)
    else:
        if not (args.tiny or args.synthetic):
            raise FileNotFoundError(f"{wfile} missing (open_clip bigG sd)")
        vparams = vision.init(key, jnp.zeros((1, 3, img_hw, img_hw)))["params"]
        tparams = text.init(key, jnp.zeros((1, 8), jnp.int32))["params"]
    vae_file = os.path.join(args.weights_dir, "sd_vae.pt")
    if os.path.exists(vae_file):
        from neurons_tpu.interop.load_weights import load_sd_vae
        vae_params, _ = load_sd_vae(vae_file, vcfg)
        vae_params = {"params": vae_params}
    else:
        hw = 8 * 2 ** (len(vcfg.block_out_channels) - 1)
        vae_params = vae.init(key, jnp.zeros((1, 3, hw, hw)))

    tokens_fn = jax.jit(lambda x: vision.apply(
        {"params": vparams}, preprocess_images(jnp.asarray(x), img_hw))[1])
    text_fn = jax.jit(lambda t: text.apply({"params": tparams},
                                           jnp.asarray(t))[1])
    vae_fn = jax.jit(lambda x: vae.apply(
        vae_params, jnp.asarray(x), method=AutoencoderKL.encode).mode())

    os.makedirs(args.root_dir, exist_ok=True)
    for train in (True, False):
        split = _load_data(args, bcfg, tcfg, train=train)
        tag = "train" if train else "test"
        pc.precompute_clip_targets(
            np.asarray(split.images), tokens_fn,
            os.path.join(args.root_dir, f"clip_targets_{tag}.npy"),
            batch_size=4 if args.tiny else 16)
        pc.precompute_vae_latents(
            np.asarray(split.images), vae_fn,
            os.path.join(args.root_dir, f"vae_latents_{tag}.npy"),
            batch_size=4 if args.tiny else 16)
    pc.precompute_class_text_embeds(
        text_fn, lambda names: np.stack(
            [np.asarray(t[:tc.context_length]) for t in
             _pad_tokens(tokenize(names), tc.context_length)]),
        os.path.join(args.root_dir, "class_text_embeds.npy"))
    print(f"=== precompute finished -> {args.root_dir} ===")


def _pad_tokens(tok_list, length):
    import numpy as np
    out = []
    for t in tok_list:
        t = list(t)[:length]
        out.append(np.asarray(t + [0] * (length - len(t)), np.int32))
    return out


def cmd_pipeline(args):
    """Run stages in sequence (reference train_neurons.sh stage string,
    e.g. '123456' or '12e')."""
    stage_map = {"1": cmd_train_brain, "2": cmd_train_decoupler,
                 "3": cmd_recon, "4": cmd_caption, "5": cmd_video,
                 "e": cmd_decoupled_eval, "6": cmd_eval}
    for s in args.stages:
        if s not in stage_map:
            raise SystemExit(f"unknown stage '{s}' (use 12345e6)")
    import time
    rows = []
    for s in args.stages:
        print(f"=== pipeline: stage {s} ===")
        t0 = time.perf_counter()
        stage_map[s](args)
        row = {"stage": s, "seconds": round(time.perf_counter() - t0, 2)}
        row.update(_STAGE_STATS.pop(s, {}))
        try:  # allocator peak is per-process-monotonic; still diagnostic
            import jax
            ms = jax.local_devices()[0].memory_stats() or {}
            if ms.get("peak_bytes_in_use"):  # absent/0 over the tunnel
                row["peak_hbm_gb"] = round(
                    ms["peak_bytes_in_use"] / 2 ** 30, 3)
        except Exception:
            pass
        rows.append(row)
        print(f"=== pipeline: stage {s} done in {row['seconds']}s"
              + (f", peak HBM {row['peak_hbm_gb']} GB"
                 if "peak_hbm_gb" in row else "") + " ===", flush=True)
    report = os.environ.get("NEURONS_TPU_PIPELINE_REPORT")
    if report:  # machine-readable per-stage report (tools/e2e_drive.py)
        with open(report, "w") as fh:
            json.dump(rows, fh, indent=1)


def cmd_serve(args):
    """HTTP inference serving over the full voxel->video pipeline
    (batching scheduler + fixed-shape jitted batches; serving.py)."""
    from neurons_tpu import serving

    if args.tiny:
        os.environ["BENCH_TINY"] = "1"
    if args.platform:
        os.environ["BENCH_PLATFORM"] = args.platform
    if getattr(args, "fast", None):
        # the serving pipeline is built from bench.build(), which reads
        # the BENCH_* env knobs — expand the named preset into them
        os.environ.setdefault(
            "BENCH_TGATE", str(FAST_PRESETS[args.fast]["recon"]["tgate"]))
        os.environ.setdefault(
            "BENCH_TGATE_VIDEO",
            str(FAST_PRESETS[args.fast]["video"]["tgate"]))
        os.environ.setdefault(
            "BENCH_TGATE_PAB",
            str(FAST_PRESETS[args.fast]["recon"]["tgate_pab"]))
    pipeline, n_vox = serving.build_bench_pipeline(args.serve_batch)
    cfg = serving.ServerConfig(host=args.host, port=args.port,
                               batch_size=args.serve_batch,
                               max_wait_ms=args.max_wait_ms)
    srv = serving.InferenceServer(pipeline, n_vox, cfg)
    print(f"serving on http://{args.host}:{srv.port}  "
          f"(batch {cfg.batch_size}, n_voxels {n_vox})", flush=True)
    srv.serve_forever()


# Named fast presets: the measured TGATE x PAB frontier (CLAUDE.md perf
# table; per-stage proxy rms vs the exact trajectory in parentheses).
# Values are the stage-specific --tgate / --tgate_pab expansions.
FAST_PRESETS = {
    # sub-5% stage-3 deviation — the validated quality bar
    "quality": {"recon": dict(tgate=33, tgate_pab=2),    # 4.7% rms
                "video": dict(tgate=10, tgate_pab=2)},   # 0.5% rms
    # mid frontier: ~4.0 s/clip at stage-3 10.7% rms
    "balanced": {"recon": dict(tgate=20, tgate_pab=2),
                 "video": dict(tgate=10, tgate_pab=2)},
    # fastest measured: ~3.6 s/clip at stage-3 21% rms
    "max": {"recon": dict(tgate=10, tgate_pab=2),
            "video": dict(tgate=10, tgate_pab=2)},
}


def _apply_fast_preset(args, stage):
    """Expand --fast into the per-stage knobs, without clobbering any
    knob the user set explicitly (explicit flags win over the preset).
    Re-entrant across stages: `pipeline` reuses one namespace, so knobs
    a previous stage's expansion set are re-expanded, not treated as
    user-explicit."""
    name = getattr(args, "fast", None)
    if not name:
        return
    if not (getattr(args, "tiny", False) or getattr(args, "synthetic",
                                                    False)):
        # honesty: the preset deviation numbers were measured on a
        # RANDOM-WEIGHT proxy (tools/fastpath_proxy.py); real-weight
        # attention entropy differs, so say so every time the preset
        # expands against real weights, and point at the revalidator.
        print(f"--- --fast {name}: deviation budget is PROXY-validated "
              "only (random-weight UNets, tools/fastpath_proxy.py). "
              "Re-score on your weights with: neurons validate "
              "--weights_dir <dir> ---", flush=True)
    preset_owned = getattr(args, "_preset_knobs", set())
    for knob, value in FAST_PRESETS[name][stage].items():
        if not getattr(args, knob, 0) or knob in preset_owned:
            setattr(args, knob, value)
            preset_owned.add(knob)
    args._preset_knobs = preset_owned


def cmd_validate(args):
    """Re-score the --fast preset frontier on ACTUAL weights.

    The shipped preset deviation numbers come from a random-weight proxy
    (tools/fastpath_proxy.py; CLAUDE.md table). The moment real weights
    exist, this command measures the same metric — rms relative
    deviation + correlation of the final latents, fast vs exact from the
    same seed — per preset and stage, on the weights in --weights_dir
    (unclip6_epoch0_step110000.ckpt for stage 3, the AnimateDiff bundle
    for stage 5). Writes fastpath_validation.json next to the weights.
    --synthetic falls back to randomized weights (== the proxy)."""
    _setup(args)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neurons_tpu.config import UNet2DConfig, UNet3DConfig, VAEConfig
    from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
    from neurons_tpu.models.unet2d import UNetModel, cross_attn_sites
    from neurons_tpu.models.unet3d import UNet3DModel
    from neurons_tpu.pipelines.keyframe import unclip_sample
    from neurons_tpu.pipelines.video import reconstruct_video

    if args.tiny:
        ucfg = UNet2DConfig(model_channels=16, channel_mult=(1, 2),
                            num_res_blocks=1, attention_resolutions=(2,),
                            transformer_depth=(1, 1), num_head_channels=8,
                            context_dim=16, adm_in_channels=8)
        u3 = UNet3DConfig(block_out_channels=(16, 32),
                          down_block_types=("CrossAttnDownBlock3D",
                                            "DownBlock3D"),
                          up_block_types=("UpBlock3D",
                                          "CrossAttnUpBlock3D"),
                          layers_per_block=1, cross_attention_dim=16,
                          attention_head_dim=8, norm_num_groups=8,
                          motion_num_attention_heads=2)
        hw3, steps3, hw5, frames, steps5, n_tok = 16, 4, 8, 4, 3, 8
    else:
        ucfg, u3 = UNet2DConfig(), UNet3DConfig()
        # proxy shapes (the frontier was scored at hw=64/38 steps stage 3,
        # hw=32/25 steps stage 5 — keep the metric comparable)
        hw3, steps3, hw5, frames, steps5, n_tok = 64, 38, 32, 16, 25, 256

    key = jax.random.PRNGKey(args.seed)

    # ---- stage-3 unCLIP UNet: real weights when available ----
    unet2d = UNetModel(ucfg)
    unclip_ckpt = os.path.join(args.weights_dir,
                               "unclip6_epoch0_step110000.ckpt")
    source3 = "real"
    if os.path.exists(unclip_ckpt) and not args.tiny:
        from neurons_tpu.interop.load_weights import load_unclip_engine
        up2, _, _ = load_unclip_engine(unclip_ckpt, ucfg, VAEConfig())
    elif args.synthetic or args.tiny:
        source3 = "random-proxy"
        up2 = unet2d.init(key, jnp.zeros((1, 4, hw3, hw3)),
                          jnp.zeros((1,)),
                          jnp.zeros((1, 8, ucfg.context_dim)),
                          jnp.zeros((1, ucfg.adm_in_channels)))["params"]
        for i, (name, _) in enumerate(cross_attn_sites(ucfg)):
            po = up2[name]["proj_out"]
            po["kernel"] = jax.random.normal(
                jax.random.PRNGKey(100 + i), po["kernel"].shape) * 0.1
        oc = up2["out_conv"]
        oc["kernel"] = jax.random.normal(jax.random.PRNGKey(99),
                                         oc["kernel"].shape) * 0.05
    else:
        raise FileNotFoundError(
            f"{unclip_ckpt} missing (pass --synthetic for the "
            "random-weight proxy)")

    def unet2d_apply(p, x, t, ctx, vec, **kw):
        return unet2d.apply({"params": p}, x, t, ctx, vec, **kw)

    tokens = jax.random.normal(jax.random.PRNGKey(1),
                               (1, n_tok, ucfg.context_dim)) * 0.3
    vec = jnp.zeros((1, ucfg.adm_in_channels))
    ident = lambda z: z

    def score3(**fast_kwargs):
        base = np.asarray(unclip_sample(
            unet2d_apply, up2, ident, jax.random.PRNGKey(5), tokens, vec,
            num_steps=steps3, latent_hw=hw3), np.float32)
        fast = np.asarray(unclip_sample(
            unet2d_apply, up2, ident, jax.random.PRNGKey(5), tokens, vec,
            num_steps=steps3, latent_hw=hw3, **fast_kwargs), np.float32)
        return _dev(base, fast)

    # ---- stage-5 UNet3D + SparseCtrl: real weights when available ----
    unet3d = UNet3DModel(u3, n_frames=frames)
    cn = SparseControlNetModel(u3, n_frames=frames)
    x0 = jnp.zeros((1, 4, frames, hw5, hw5))
    txt0 = jnp.zeros((1, 77, u3.cross_attention_dim))
    mm_path = os.path.join(args.weights_dir, "v3_sd15_mm.ckpt")
    source5 = "real"
    if os.path.exists(mm_path) and not args.tiny:
        from neurons_tpu.interop.load_weights import (
            load_animatediff_unet3d, load_sparse_controlnet)
        base_w = os.path.join(args.weights_dir,
                              "realisticVisionV60B1_v51VAE.safetensors")
        if not os.path.exists(base_w):
            base_w = os.path.join(args.weights_dir, "sd-v1-5.ckpt")
        lora = os.path.join(args.weights_dir, "v3_sd15_adapter.ckpt")
        up3, _ = load_animatediff_unet3d(
            base_w, mm_path, u3,
            lora_path=lora if os.path.exists(lora) else None)
        up3 = {"params": up3}
        cp3, _ = load_sparse_controlnet(
            os.path.join(args.weights_dir, "v3_sd15_sparsectrl_rgb.ckpt"),
            u3)
        cp3 = {"params": cp3}
    elif args.synthetic or args.tiny:
        source5 = "random-proxy"
        up3 = unet3d.init(key, x0, jnp.zeros((1,)), txt0)
        up3 = {"params": dict(up3["params"])}
        up3["params"]["conv_out"] = {
            "kernel": jax.random.normal(
                jax.random.PRNGKey(7),
                up3["params"]["conv_out"]["kernel"].shape) * 0.05,
            "bias": up3["params"]["conv_out"]["bias"]}
        for name, sub in up3["params"].items():
            if "motion" in name and "proj_out" in sub:
                sub["proj_out"] = {
                    "kernel": jax.random.normal(
                        jax.random.fold_in(jax.random.PRNGKey(8),
                                           hash(name) % (2 ** 31)),
                        sub["proj_out"]["kernel"].shape) * 0.05,
                    "bias": sub["proj_out"]["bias"]}
        cp3 = cn.init(jax.random.PRNGKey(1), x0, jnp.zeros((1,)), txt0,
                      x0, jnp.zeros((1, 1, frames, hw5, hw5)))
    else:
        raise FileNotFoundError(
            f"{mm_path} missing (pass --synthetic for the random-weight "
            "proxy)")

    def pool_encode(x):
        n, c, h, w = x.shape
        p = x.reshape(n, c, h // 8, 8, w // 8, 8).mean(axis=(3, 5))
        return jnp.concatenate([p, p[:, :1]], axis=1) - 0.5

    common5 = dict(
        unet3d_apply=lambda p, x, t, c, d, m, **k:
            unet3d.apply(p, x, t, c, d, m, **k),
        unet3d_params=up3,
        controlnet_apply=lambda p, x, t, c, cond, mask, s:
            cn.apply(p, x, t, c, cond, mask, s),
        controlnet_params=cp3,
        vae_encode_mode=pool_encode,
        vae_decode=lambda z: jnp.zeros((z.shape[0], 3, hw5 * 8, hw5 * 8)),
        key=jax.random.PRNGKey(2),
        blurry_video=jax.random.uniform(jax.random.PRNGKey(3),
                                        (1, 6, 3, hw5 * 8, hw5 * 8)),
        keyframe=jax.random.uniform(jax.random.PRNGKey(4),
                                    (1, 3, hw5 * 8, hw5 * 8)),
        text_embeddings=jax.random.normal(
            jax.random.PRNGKey(5), (1, 77, u3.cross_attention_dim)) * 0.1,
        uncond_embeddings=jnp.zeros((1, 77, u3.cross_attention_dim)),
        num_steps=steps5, n_frames=frames)

    def score5(**fast_kwargs):
        base = np.asarray(reconstruct_video(**common5).latents, np.float32)
        fast = np.asarray(reconstruct_video(**common5,
                                            **fast_kwargs).latents,
                          np.float32)
        return _dev(base, fast)

    def _dev(base, fast):
        diff = fast - base
        rms = float(np.sqrt((diff ** 2).mean())
                    / max(np.sqrt((base ** 2).mean()), 1e-12))
        corr = float(np.corrcoef(base.ravel(), fast.ravel())[0, 1])
        return {"rms_rel": round(rms, 5), "corr": round(corr, 6)}

    results = {"weights_stage3": source3, "weights_stage5": source5,
               "shapes": {"stage3": [hw3, steps3],
                          "stage5": [hw5, frames, steps5]},
               "presets": {}}
    for name, spec in sorted(FAST_PRESETS.items()):
        r3 = score3(tgate_step=min(spec["recon"]["tgate"], steps3 - 1),
                    tgate_pab=spec["recon"]["tgate_pab"])
        r5 = score5(tgate_step=min(spec["video"]["tgate"], steps5 - 1),
                    tgate_pab=spec["video"]["tgate_pab"])
        results["presets"][name] = {"stage3": r3, "stage5": r5}
        print(f"--fast {name}: stage3 rms={r3['rms_rel']:.4f} "
              f"corr={r3['corr']:.5f} | stage5 rms={r5['rms_rel']:.4f} "
              f"corr={r5['corr']:.5f}  [{source3}/{source5} weights]",
              flush=True)
    out_path = os.path.join(args.weights_dir, "fastpath_validation.json")
    try:
        os.makedirs(args.weights_dir, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"=== validate finished -> {out_path} ===")
    except OSError as e:
        print(f"(could not write {out_path}: {e})")


def _add_fastpath_args(p):
    """Opt-in approximate sampler fast paths (PAPERS.md: TGATE arXiv
    2404.02747, Faster-Diffusion arXiv 2312.09608, PAB arXiv 2408.12588).
    Default is exact reference sampling."""
    p.add_argument("--fast", choices=sorted(FAST_PRESETS), default=None,
                   help="named fast preset expanding to the measured "
                        "TGATE x PAB knobs (quality: sub-5%% stage-3 "
                        "proxy deviation at ~4.5 s/clip; balanced: "
                        "~4.0 s/clip; max: ~3.6 s/clip); explicit "
                        "--tgate/--tgate_pab flags override")
    p.add_argument("--tgate", type=int, default=0, metavar="STEP",
                   help="TGATE: freeze cross-attn + collapse CFG from "
                        "this step (0 = off)")
    p.add_argument("--tgate_pab", type=int, default=0, metavar="K",
                   help="with --tgate: also broadcast spatial(/temporal) "
                        "attention in the gated phase, recomputing every "
                        "K-th step")
    p.add_argument("--encoder_reuse", type=int, default=1, metavar="K",
                   help="Faster-Diffusion: recompute the UNet encoder "
                        "every K-th step (1 = off)")
    p.add_argument("--pab", type=str, default=None, metavar="I1,I2[,I3]",
                   help="Pyramid Attention Broadcast recompute intervals "
                        "(stage 3: spatial,cross; stage 5: "
                        "spatial,temporal,cross); nested")
    p.add_argument("--pab_range", type=str, default=None, metavar="LO,HI",
                   help="restrict PAB broadcasting to steps [LO, HI)")
    p.add_argument("--deep_cache", type=int, default=0, metavar="N",
                   help="DeepCache (stage 3, arXiv 2312.00858): full UNet "
                        "every N-th step, shallow level-0-only recompute "
                        "in between (0 = off)")


def _parse_ints(s):
    return tuple(int(v) for v in s.split(",")) if s else None


def main(argv=None):
    parser = argparse.ArgumentParser(prog="neurons")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-brain", help="stage 1")
    _add_common(p)
    _add_train_args(p)
    p.set_defaults(fn=cmd_train_brain)

    p = sub.add_parser("train-decoupler", help="stage 2")
    _add_common(p)
    _add_train_args(p)
    p.set_defaults(fn=cmd_train_decoupler)

    p = sub.add_parser("recon", help="stage 3")
    _add_common(p)
    _add_train_args(p)
    p.add_argument("--enhance", action="store_true")
    _add_fastpath_args(p)
    p.set_defaults(fn=cmd_recon)

    p = sub.add_parser("caption", help="stage 4")
    _add_common(p)
    p.add_argument("--enhance", action="store_true")
    p.add_argument("--allow_raw_token_captions", action="store_true",
                   help="without a cached OPT tokenizer, write raw "
                        "'ids:...' caption strings instead of failing")
    p.set_defaults(fn=cmd_caption)

    p = sub.add_parser("video", help="stage 5")
    _add_common(p)
    _add_train_args(p)
    p.add_argument("--enhance", action="store_true")
    p.add_argument("--caption_mode", type=str, default="auto",
                   choices=["auto", "self", "blip"],
                   help="prompt source: stage-3 GPT-2 captions ('self') or "
                        "stage-4 BLIP-2 captions ('blip'); 'auto' prefers "
                        "blip when present (reference neuroclips_video.py"
                        ":186-191 --mode)")
    p.add_argument("--shard", type=int, default=0,
                   help="round-robin clip shard index (reference "
                        "neuroclips_video.py:39-40 rank scattering)")
    p.add_argument("--num_shards", type=int, default=1)
    _add_fastpath_args(p)
    p.set_defaults(fn=cmd_video)

    p = sub.add_parser("decoupled-eval", help="stage e")
    _add_common(p)
    _add_train_args(p)
    p.set_defaults(fn=cmd_decoupled_eval)

    p = sub.add_parser("eval", help="stage 6")
    _add_common(p)
    p.add_argument("--mode", type=str, default=None,
                   help="gen_videos_{mode} to score; defaults to "
                        "'enhance' with --enhance else 'motion'")
    p.add_argument("--enhance", action="store_true")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("precompute", help="build frozen-encoder tables "
                                          "(CLIP targets, VAE latents, "
                                          "class text embeds)")
    _add_common(p)
    _add_train_args(p)
    p.set_defaults(fn=cmd_precompute)

    p = sub.add_parser("validate", help="re-score the --fast preset "
                       "deviation frontier on the weights in "
                       "--weights_dir (writes fastpath_validation.json)")
    _add_common(p)
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("serve", help="HTTP inference server over the "
                                     "full voxel->video pipeline "
                                     "(neurons_tpu/serving.py)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--serve_batch", type=int, default=1,
                   help="compiled batch size requests coalesce into")
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--fast", choices=sorted(FAST_PRESETS), default=None,
                   help="serve with a named fast preset (expands to the "
                        "BENCH_TGATE* env knobs the serving pipeline "
                        "honors; explicit env vars win)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("pipeline", help="run stages in sequence, e.g. "
                                        "'pipeline 123456'")
    p.add_argument("stages", type=str,
                   help="stage string: subset of 12345e6, in order")
    _add_common(p)
    _add_train_args(p)
    # sampler fast paths apply per stage: _apply_fast_preset is
    # re-entrant, so `pipeline 35 --fast quality` expands to the
    # stage-3 gate in recon and the stage-5 gate in video
    _add_fastpath_args(p)
    p.add_argument("--enhance", action="store_true")
    p.add_argument("--mode", type=str, default=None)
    p.add_argument("--caption_mode", type=str, default="auto",
                   choices=["auto", "self", "blip"])
    p.add_argument("--allow_raw_token_captions", action="store_true")
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.set_defaults(fn=cmd_pipeline)

    args = parser.parse_args(argv)
    # join a multi-host process group when the env asks for one (the
    # reference's `accelerate launch` rendezvous, train_neurons.sh:3,92;
    # single-process runs are a no-op)
    from neurons_tpu.parallel.distributed import initialize
    initialize()
    if getattr(args, "profile", None):
        import jax
        os.makedirs(args.profile, exist_ok=True)
        jax.profiler.start_trace(args.profile)
        try:
            return args.fn(args)
        finally:
            jax.profiler.stop_trace()
            print(f"--- profiler trace -> {args.profile} ---")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
