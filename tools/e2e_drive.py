"""Production-scale end-to-end drive: N clips voxel -> GIF -> metrics.

bench.py times one clip through the fused stage-3+5 compute graphs; this
drives the actual CLI pipeline (stages 3 -> 4 -> 5 -> 6) at FULL model
size over a real clip set, exercising the artifact IO contract the
reference runs at 1200 clips (run_metrics.py:36-47): stage-3 .pt bundles
(recon/blurry/caption dialects), BLIP-2 captioning over the saved
recons, per-clip GIF encoding through the native C++ codec, and the
stage-6 metric runner over the GIF directory.

Records per-stage wall time + peak HBM (via the in-process pipeline
report), clips/hour, and total artifact bytes; writes E2E_r{N}.json.

Run ON THE TPU from /root/repo (no PYTHONPATH — axon plugin discovery):
    python tools/e2e_drive.py --n_test 50
Weights are synthetic (zero egress: the released ckpts are unfetchable),
so METRIC VALUES are meaningless; the throughput/IO/memory numbers and
the artifact contract are what this measures.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_test", type=int, default=50)
    ap.add_argument("--exp_dir", type=str, default="/tmp/e2e_drive")
    ap.add_argument("--stages", type=str, default="3456")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (default: ambient = TPU)")
    ap.add_argument("--enhance", action="store_true",
                    help="drive the decoupler-guided ENHANCE mode — the "
                         "reference's headline configuration (recon_"
                         "keyframe_neurons_enhance.py:377-462: seg masks "
                         "gate the VAE latents, prior tokens modulated "
                         "before unCLIP; train_neurons.sh:72-76)")
    ap.add_argument("--out", type=str, default=None,
                    help="default: E2E_r05.json / E2E_FULL_r05.json at "
                         "--n_test >= 1200 / E2E_ENHANCE_r05.json with "
                         "--enhance")
    args = ap.parse_args()
    if args.out is None:
        tag = ("E2E_ENHANCE_r05" if args.enhance
               else "E2E_FULL_r05" if args.n_test >= 1200 else "E2E_r05")
        args.out = os.path.join(_REPO, tag + ".json")

    report_path = os.path.join(args.exp_dir, "pipeline_report.json")
    os.makedirs(args.exp_dir, exist_ok=True)
    os.environ["NEURONS_TPU_PIPELINE_REPORT"] = report_path

    from neurons_tpu import cli

    argv = ["pipeline", args.stages, "--synthetic",
            "--exp_dir", args.exp_dir, "--n_test", str(args.n_test)]
    if args.enhance:
        argv += ["--enhance"]
    if args.platform:
        argv += ["--platform", args.platform]
    t0 = time.perf_counter()
    cli.main(argv)
    wall = time.perf_counter() - t0

    rows = json.load(open(report_path))
    gen_secs = sum(r["seconds"] for r in rows if r["stage"] in "345")
    # steady-state rate: first batches carry the cold compiles, so the
    # wall total alone misleads; every generation stage (4 included)
    # records its post-compile marginal rate via cli._record_steady
    gen_rows = [r for r in rows if r["stage"] in "345"]
    steady = sum(r.get("steady_s_per_clip", r["seconds"] / args.n_test)
                 for r in gen_rows)
    # leak/slowdown check over long runs: first-100 vs last-100 clip
    # window rates per stage (present when n_test is large enough)
    drift = {r["stage"]: round(r["last100_s_per_clip"]
                               / r["first100_s_per_clip"], 4)
             for r in gen_rows
             if r.get("first100_s_per_clip")
             and r.get("last100_s_per_clip")}
    peak = max((r.get("peak_hbm_gb", 0) for r in rows), default=0)
    doc = {
        "n_clips": args.n_test,
        "stages": args.stages,
        "total_wall_s": round(wall, 1),
        "per_stage": rows,
        "sec_per_clip_gen_incl_cold_compile": round(
            gen_secs / args.n_test, 3) if gen_secs else None,
        "sec_per_clip_gen_steady": round(steady, 3) if steady else None,
        "clips_per_hour_gen_steady": round(3600 / steady, 1)
        if steady else None,
        "last100_over_first100_rate": drift or None,
        "peak_hbm_gb": peak or None,  # memory_stats absent over tunnel
        "artifact_bytes": dir_bytes(args.exp_dir),
        "weights": "synthetic (zero egress; throughput/IO contract run, "
                   "not a quality run)",
    }
    import jax
    doc["platform"] = jax.devices()[0].platform
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
