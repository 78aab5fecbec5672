"""The north-star quality gate, pre-staged as ONE command.

BASELINE.md's open half is generation QUALITY: SSIM and 2-way-ID within
1% of the CUDA reference on the full CC2017 test split. That has been
environment-blocked every round (zero egress: the released weights and
the reference's >60 GB EXP dump on HF `McGregorW/NEURONS` are
unfetchable), so the gate itself has never been runnable. This script
makes it a single command the day any asset channel exists:

    python tools/quality_gate.py manifest          # what to fetch, where
    python tools/quality_gate.py check             # which assets are here
    python tools/quality_gate.py run               # full-split gate (TPU)
    python tools/quality_gate.py dry-run           # tiny synthetic
                                                   # rehearsal of every
                                                   # code path (CPU)

`run` drives the real CLI pipeline (stages 3 -> 4 -> 5 -> 6) over the
full 1200-clip split with the fetched weights, then compares the
stage-6 metric report against the reference's numbers with the
BASELINE.md tolerances. `dry-run` executes the same orchestration and
comparison logic at tiny synthetic shapes, so the gate's own plumbing
is tested in-tree (tests/test_cli.py::test_quality_gate_dry_run).

Reference provenance for the manifest (cited file:line are in
/root/reference):
  - NEURONS trained ckpts + EXP logs: README.md:31 (HF McGregorW/NEURONS)
  - unCLIP ckpt: recon_keyframe_neurons.py:236-244 (unclip6 config + ckpt)
  - AnimateDiff v3 bundle: scripts/neuroclips_video.py:188-215 +
    configs/NeuroClips/control.yaml (mm, adapter LoRA, SparseCtrl rgb,
    RealisticVision base)
  - BLIP-2: caption_keyframe.py:14-21 (Salesforce/blip2-opt-2.7b)
  - metric classifiers: run_metrics.py:57-133 (ViT-base, VideoMAE-
    Kinetics, CLIP ViT-L/14)
  - CC2017 tensors + GT videos: README dataset section,
    scripts/neuroclips_video.py:323-357
  - CLIP BPE merges: animatediff/data/dataset.py:30-37
"""

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# (dest relative to --weights_dir unless marked root_dir, source,
#  used by, importer that consumes it)
MANIFEST = [
    ("last.pth", "HF McGregorW/NEURONS EXP dump (subject-specific "
     "stage-1/2 NEURONS ckpt)", "stages 3/4/5 conditioning",
     "interop.torch_import.import_neurons_ensemble"),
    ("unclip6_epoch0_step110000.ckpt",
     "HF stabilityai (SD2.1-unCLIP, sgm layout)", "stage 3 keyframes",
     "interop.convert_ldm.import_unclip_engine"),
    ("v3_sd15_mm.ckpt", "HF guoyww/animatediff (v3 motion module)",
     "stage 5 video", "interop.load_weights.load_motion_module"),
    ("v3_sd15_adapter.ckpt", "HF guoyww/animatediff (v3 LoRA adapter)",
     "stage 5 video", "interop.convert_ldm.merge_lora_into_state_dict"),
    ("v3_sd15_sparsectrl_rgb.ckpt", "HF guoyww/animatediff (SparseCtrl)",
     "stage 5 video", "interop.load_weights.load_sparse_controlnet"),
    ("realisticVisionV60B1_v51VAE.safetensors",
     "civitai RealisticVision v6.0-B1 (sd-v1-5.ckpt is the fallback, "
     "scripts/neuroclips_video.py:195)", "stage 5 base UNet/VAE/CLIP",
     "interop.convert_ldm.import_ldm_checkpoint"),
    ("blip2-opt.pt", "HF Salesforce/blip2-opt-2.7b state dict",
     "stage 4 captions", "interop.torch_import.import_blip2"),
    ("open_clip_bigG.pt", "HF laion CLIP-ViT-bigG-14 state dict",
     "precompute (stage-1 targets)", "interop.torch_import.import_clip"),
    ("sd_vae.pt", "HF stabilityai sd-vae state dict",
     "precompute (blurry targets)", "interop.torch_import.import_vae"),
    ("vit_base.pt", "HF google/vit-base-patch16-224 state dict",
     "stage 6 frame 2/50-way", "evaluation.runner metric importer"),
    ("videomae_kinetics.pt",
     "HF MCG-NJU/videomae-base-finetuned-kinetics state dict",
     "stage 6 video 2/50-way", "evaluation.runner metric importer"),
    ("clip_vit_l.pt", "HF openai/clip-vit-large-patch14 state dict",
     "stage 6 CLIP-pcc", "evaluation.runner metric importer"),
    ("bpe_simple_vocab_16e6.txt.gz", "openai/CLIP repo (BPE merges)",
     "text tokenization", "data.clip_tokenizer"),
    ("ROOT:GT_test_3fps.pt", "CC2017 release (per NEURONS README)",
     "stage 5 first-frame + stage 6 GT", "pipelines.io"),
    ("ROOT:cc2017_tensors/", "CC2017 fMRI tensors, subjects 1/2/3 "
     "(13447/14828/9114 voxels)", "all stages", "data.cc2017"),
    ("ROOT:EXP_reference_metrics.json", "HF McGregorW/NEURONS EXP logs "
     "-> transcribe the reference's stage-6 table into this json "
     "({metric: value})", "the comparison target", "this script"),
]

# BASELINE.md: SSIM and 2-way-ID within 1% of the CUDA reference; the
# rest reported (paper table reproduction tolerances are not pinned by
# the reference repo, so they are advisory at 5%).
TOLERANCES = {"ssim": 0.01, "frame_2way": 0.01, "video_2way": 0.01,
              "psnr": 0.05, "frame_50way": 0.05, "video_50way": 0.05,
              "clip_pcc": 0.05}
REQUIRED = ("ssim", "frame_2way")


def asset_path(name, weights_dir, root_dir):
    if name.startswith("ROOT:"):
        return os.path.join(root_dir, name[5:])
    return os.path.join(weights_dir, name)


def cmd_manifest(args):
    print(f"{'asset':44s} {'used by':28s} source")
    for name, src, used, importer in MANIFEST:
        print(f"{name:44s} {used:28s} {src}")
        print(f"{'':44s} importer: {importer}")
    print("\nDestinations: plain files -> --weights_dir "
          f"({args.weights_dir}); ROOT: entries -> --root_dir "
          f"({args.root_dir}).")


def cmd_check(args):
    missing = []
    for name, src, used, _ in MANIFEST:
        p = asset_path(name, args.weights_dir, args.root_dir)
        ok = os.path.exists(p.rstrip("/"))
        print(f"[{'ok' if ok else 'MISSING'}] {p}")
        if not ok:
            missing.append(name)
    if missing:
        print(f"\n{len(missing)}/{len(MANIFEST)} assets missing — the "
              "gate cannot run. `python tools/quality_gate.py manifest` "
              "lists sources.")
        return 1
    print("\nAll assets present. `python tools/quality_gate.py run`.")
    return 0


def compare(report: dict, reference: dict) -> dict:
    """BASELINE.md comparison: relative deviation per metric vs the
    reference's number, PASS iff every REQUIRED metric is within its
    tolerance (and present on both sides)."""
    rows, ok = {}, True
    for k, tol in TOLERANCES.items():
        if k not in reference:
            continue
        if k not in report:
            rows[k] = {"status": "missing-in-ours"}
            ok = ok and k not in REQUIRED
            continue
        ref, ours = float(reference[k]), float(report[k])
        rel = abs(ours - ref) / max(abs(ref), 1e-12)
        rows[k] = {"ours": ours, "reference": ref,
                   "rel_dev": round(rel, 5), "tolerance": tol,
                   "within": rel <= tol, "required": k in REQUIRED}
        if k in REQUIRED and rel > tol:
            ok = False
    return {"pass": ok, "metrics": rows}


def _pipeline(args, extra):
    """Drive the CLI pipeline in a subprocess (the stages manage their
    own jax platform/backend; a fresh process per gate run keeps the
    TPU tunnel single-owner, see .claude/skills/verify)."""
    cmd = [sys.executable, "-m", "neurons_tpu.cli", "pipeline", "3456",
           "--exp_dir", args.exp_dir,
           "--weights_dir", args.weights_dir,
           "--root_dir", args.root_dir] + extra
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd, cwd=_REPO)


def cmd_run(args, dry=False):
    if dry:
        rc = _pipeline(args, ["--tiny", "--synthetic", "--platform",
                              "cpu", "--n_test", str(args.n_test or 4)])
    else:
        if cmd_check(args):
            return 1
        rc = _pipeline(args, ["--n_test", str(args.n_test or 1200)])
    if rc:
        print(f"pipeline failed rc={rc}")
        return rc

    # the stage-6 report the pipeline wrote (mode defaults to motion)
    from neurons_tpu.pipelines import io
    rep_path = os.path.join(io.exp_dir(args.exp_dir, "exp1", 1),
                            "metrics_motion.json")
    report = json.load(open(rep_path))

    ref_path = args.ref_metrics or asset_path(
        "ROOT:EXP_reference_metrics.json", args.weights_dir,
        args.root_dir)
    if dry and not os.path.exists(ref_path):
        # rehearsal target: the reference "numbers" are our own report
        # nudged inside/outside tolerance so both branches execute
        fake = {k: report[k] * (1 + 0.5 * TOLERANCES[k])
                for k in TOLERANCES if k in report}
        os.makedirs(os.path.dirname(ref_path) or ".", exist_ok=True)
        json.dump(fake, open(ref_path, "w"))
    reference = json.load(open(ref_path))

    verdict = compare(report, reference)
    verdict["ours_report"] = rep_path
    verdict["reference_metrics"] = ref_path
    verdict["n_test"] = args.n_test or (4 if dry else 1200)
    verdict["weights"] = "synthetic DRY-RUN (metric values meaningless; "\
        "this exercises the gate machinery only)" if dry else "real"
    out = args.out or os.path.join(
        _REPO, "QUALITY_GATE_DRYRUN.json" if dry else "QUALITY_GATE.json")
    json.dump(verdict, open(out, "w"), indent=2)
    print(json.dumps(verdict["metrics"], indent=2))
    print(f"{'PASS' if verdict['pass'] else 'FAIL'} -> {out}")
    return 0 if (dry or verdict["pass"]) else 2


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("phase", choices=["manifest", "check", "run",
                                      "dry-run"])
    ap.add_argument("--weights_dir", default="./pretrained_weights")
    ap.add_argument("--root_dir", default="./data")
    ap.add_argument("--exp_dir", default="/tmp/quality_gate")
    ap.add_argument("--n_test", type=int, default=None)
    ap.add_argument("--ref_metrics", default=None,
                    help="json {metric: value} transcribed from the "
                    "reference EXP logs (default: ROOT:EXP_reference_"
                    "metrics.json)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    if args.phase == "manifest":
        return cmd_manifest(args)
    if args.phase == "check":
        return cmd_check(args)
    return cmd_run(args, dry=args.phase == "dry-run")


if __name__ == "__main__":
    sys.exit(main())
