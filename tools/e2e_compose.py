"""Compose E2E_FULL_r04.json from the two-leg full-split drive.

The first 1200-clip attempt ran stages 3+4 green and then OOM'd at
stage-5 startup (whole-split device residency, fixed in faa8366) before
the pipeline report was flushed — so the stage-3/4 steady stats live
only in that leg's progress lines. This tool reconstructs them from the
log marks (each batch printed cumulative `done/total (C s/clip)`, so
elapsed = done*C to print precision) and merges the relaunched
stage-5/6 leg's proper report into one artifact, with the provenance
recorded.

    python tools/e2e_compose.py /tmp/e2e_full.log E2E_FULL_r04_s56.json
"""

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def marks_from_log(log_path, stage):
    pat = re.compile(rf"--- stage {stage}: (\d+)/(\d+) clips "
                     rf"\(([\d.]+) s/clip\) ---")
    marks, total = [], None
    for line in open(log_path, errors="replace"):
        m = pat.search(line)
        if m:
            done, total, cum = int(m.group(1)), int(m.group(2)), float(
                m.group(3))
            marks.append((done, done * cum))
    return marks, total


def stage_row(stage, marks, batch):
    n_done, t_total = marks[-1]
    t_first = marks[0][1]
    steady = ((t_total - t_first) / (n_done - batch)
              if n_done > batch else t_total / max(n_done, 1))
    row = {"stage": stage, "seconds": round(t_total, 2),
           "steady_s_per_clip": round(steady, 3), "batch": batch,
           "first_batch_s": round(t_first, 2),
           "source": "reconstructed from leg-1 drive-log marks "
                     "(print precision ~1%)"}
    win = 100
    # reconstruction reads elapsed = done*printed-s/clip with the print
    # rounded to 2dp, so elapsed error is ±0.005*done (~±6 s at the
    # tail); window rates are meaningful only when a 100-clip window
    # spans far more than that (stage 4 at 0.04 s/clip does not)
    if n_done - batch >= 2 * win and (t_total - t_first) > 600:
        first = next(m for m in marks if m[0] >= batch + win)
        row["first100_s_per_clip"] = round(
            (first[1] - t_first) / (first[0] - batch), 3)
        last_base = next(m for m in reversed(marks)
                         if n_done - m[0] >= win)
        row["last100_s_per_clip"] = round(
            (t_total - last_base[1]) / (n_done - last_base[0]), 3)
    return row


def stall_forensics(marks, batch, wall_s):
    """Decompose a stage's wall time from its cumulative marks.

    The steady formula (t_total-t_first)/(n-batch) charges any mid-run
    stall to every clip; the leg-2 stage-5 run had two silent ~14/21-min
    stalls (no correlated log output; the surrounding marginal rate is
    unchanged, consistent with transient TPU-tunnel hiccups, not leaks),
    so also report a stall-robust median marginal rate + the explicit
    stall events + the off-loop time (pre-loop setup: 5.7 GB artifact
    load, synthetic weight init, caption text-encode, model build; plus
    the post-loop GIF-pool drain, ~0.06 s/clip encode -> small)."""
    stalls = []
    med = None
    import statistics
    intervals = [(b[0], (b[1] - a[1]) / (b[0] - a[0]))
                 for a, b in zip(marks, marks[1:]) if b[0] > a[0]]
    # reconstructed elapsed is quantized to 0.005*done (~±6 s at the
    # tail), so the marginal-rate median is taken over >=20-clip windows
    win = [(b[0], (b[1] - a[1]) / (b[0] - a[0]))
           for a, b in zip(marks[:-20], marks[20:]) if b[0] > a[0]]
    if win:
        med = statistics.median(r for _, r in win)
    if intervals and med is not None:
        for done, r in intervals:
            if r > max(10 * med, 60):  # far above print-precision noise
                stalls.append({"at_clip": done,
                               "stall_s": round(r, 1)})
    loop_s = marks[-1][1] - marks[0][1]
    n_loop = marks[-1][0] - marks[0][0]
    stall_total = sum(s["stall_s"] for s in stalls)
    out = {
        "loop_s": round(marks[-1][1], 1),
        "setup_plus_drain_s": round(wall_s - marks[-1][1], 1)
        if wall_s else None,
        "stall_events": stalls or None,
        "steady_median_marginal_s_per_clip": round(med, 3)
        if med is not None else None,
    }
    if stalls and n_loop:
        out["steady_excl_stalls_s_per_clip"] = round(
            (loop_s - stall_total) / n_loop, 3)
    return out


def main():
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_full.log"
    s56_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "E2E_FULL_r04_s56.json")
    s56_log = sys.argv[3] if len(sys.argv) > 3 else "/tmp/e2e_s56.log"
    out = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        _REPO, "E2E_FULL_r04.json")
    leg_note = (sys.argv[5] if len(sys.argv) > 5 else
                "stages 56 (leg 2, relaunched after the whole-split "
                "host-residency fix faa8366; stage-5 graph unchanged "
                "-> warm cache)")
    s56 = json.load(open(s56_path))

    m3, n3 = marks_from_log(log_path, 3)
    m4, n4 = marks_from_log(log_path, 4)
    rows = [stage_row("3", m3, 4), stage_row("4", m4, 8)]
    # `seconds` above is loop-marks elapsed; the pipeline runner's own
    # stage walls include pre-loop setup (synthetic full-width weight
    # init, artifact load) + post-loop whole-split .pt writes — report
    # both so the off-loop one-time cost is visible (leg-1 stage 3:
    # 6944 s wall vs 3684 s loop)
    walls = dict(re.findall(
        r"=== pipeline: stage (\d) done in ([\d.]+)s ===",
        open(log_path, errors="replace").read()))
    for r in rows:
        w = walls.get(r["stage"])
        if w:
            r["stage_wall_s"] = float(w)
            r["setup_plus_drain_s"] = round(
                float(w) - r["seconds"], 1)
    rows += s56["per_stage"]

    if os.path.exists(s56_log):
        m5, _ = marks_from_log(s56_log, 5)
        if m5:
            r5 = next(r for r in rows if r["stage"] == "5")
            r5.update(stall_forensics(m5, r5.get("batch", 1),
                                      r5.get("seconds")))

    gen_rows = [r for r in rows if r["stage"] in "345"]
    steady = sum(r.get("steady_excl_stalls_s_per_clip",
                       r["steady_s_per_clip"]) for r in gen_rows)
    steady_conservative = sum(r["steady_s_per_clip"] for r in gen_rows)
    drift = {r["stage"]: round(r["last100_s_per_clip"]
                               / r["first100_s_per_clip"], 4)
             for r in gen_rows
             if r.get("first100_s_per_clip") and r.get(
                 "last100_s_per_clip")}
    doc = {
        "n_clips": n3 or s56["n_clips"],
        "stages": "3456",
        "legs": ["stages 34 (leg 1, log-reconstructed rows)", leg_note],
        "per_stage": rows,
        "sec_per_clip_gen_steady": round(steady, 3),
        "sec_per_clip_gen_steady_incl_stalls": round(
            steady_conservative, 3),
        "clips_per_hour_gen_steady": round(3600 / steady, 1),
        "last100_over_first100_rate": drift or None,
        "total_wall_s_leg2": s56.get("total_wall_s"),
        "artifact_bytes": s56.get("artifact_bytes"),
        "weights": s56.get("weights"),
        "platform": s56.get("platform"),
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(json.dumps(doc, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
