"""The pre-staged north-star quality gate (tools/quality_gate.py,
VERDICT r3 item 10): BASELINE.md comparison semantics — SSIM/2-way-ID
within 1% REQUIRED, advisory 5% on the rest — plus the manifest/check
phases. The full dry-run (tiny pipeline rehearsal) runs out-of-band
(QUALITY_GATE_DRYRUN.json); here the pure logic is pinned."""

import json

from tools.quality_gate import (MANIFEST, REQUIRED, TOLERANCES,
                                asset_path, compare, main)


def test_compare_passes_within_tolerance():
    ref = {"ssim": 0.200, "frame_2way": 0.80, "psnr": 10.0}
    ours = {"ssim": 0.201, "frame_2way": 0.794, "psnr": 10.4}
    v = compare(ours, ref)
    assert v["pass"] is True
    assert v["metrics"]["ssim"]["within"]
    assert v["metrics"]["ssim"]["required"]
    assert v["metrics"]["psnr"]["rel_dev"] == 0.04


def test_compare_fails_on_required_metric_out_of_tolerance():
    ref = {"ssim": 0.200, "frame_2way": 0.80}
    v = compare({"ssim": 0.220, "frame_2way": 0.80}, ref)  # ssim 10% off
    assert v["pass"] is False
    assert not v["metrics"]["ssim"]["within"]
    # advisory metric out of tolerance does NOT fail the gate
    v2 = compare({"ssim": 0.200, "frame_2way": 0.80, "psnr": 20.0},
                 {"ssim": 0.200, "frame_2way": 0.80, "psnr": 10.0})
    assert v2["pass"] is True and not v2["metrics"]["psnr"]["within"]


def test_compare_fails_when_required_metric_missing_in_ours():
    v = compare({"psnr": 10.0}, {"ssim": 0.2, "psnr": 10.0})
    assert v["pass"] is False
    assert v["metrics"]["ssim"]["status"] == "missing-in-ours"


def test_required_metrics_are_baseline_contract():
    # BASELINE.md: "SSIM and 2-way-ID within 1%"
    assert set(REQUIRED) == {"ssim", "frame_2way"}
    assert TOLERANCES["ssim"] == 0.01 and TOLERANCES["frame_2way"] == 0.01


def test_manifest_and_check_phases(tmp_path, capsys):
    assert main(["manifest"]) in (None, 0)
    out = capsys.readouterr().out
    for name, *_ in MANIFEST:
        assert name.replace("ROOT:", "") in out
    # check: everything missing -> rc 1 and each path listed
    rc = main(["check", "--weights_dir", str(tmp_path / "w"),
               "--root_dir", str(tmp_path / "r")])
    assert rc == 1
    out = capsys.readouterr().out
    assert out.count("MISSING") == len(MANIFEST)
    # materialize every asset -> rc 0
    import os
    for name, *_ in MANIFEST:
        p = asset_path(name, str(tmp_path / "w"), str(tmp_path / "r"))
        os.makedirs(os.path.dirname(p.rstrip("/")), exist_ok=True)
        if name.endswith("/"):
            os.makedirs(p, exist_ok=True)
        else:
            with open(p, "w") as f:
                json.dump({}, f)
    assert main(["check", "--weights_dir", str(tmp_path / "w"),
                 "--root_dir", str(tmp_path / "r")]) == 0
