"""Full six-stage pipeline chain as one test (the reference's stage-gated
integration testing, SURVEY.md section 4) — env-gated (NEURONS_TPU_E2E=1)
because it compiles every stage graph (~5 min on CPU); the /verify drives
run the same chain interactively."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("NEURONS_TPU_E2E"),
    reason="set NEURONS_TPU_E2E=1 to run the full pipeline chain")


def test_all_stages_chain(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    base = [sys.executable, "-m", "neurons_tpu.cli"]
    common = ["--synthetic", "--tiny", "--platform", "cpu", "--exp", "e2e",
              "--exp_dir", str(tmp_path)]
    train = ["--num_epochs", "1", "--batch_size", "8"]

    for cmd in (["train-brain"] + common + train,
                ["train-decoupler"] + common + train,
                ["recon"] + common + train + ["--enhance"],
                ["caption"] + common + ["--enhance"],
                ["video"] + common + train + ["--enhance"],
                ["decoupled-eval"] + common + train,
                ["eval"] + common + ["--mode", "enhance"]):
        r = subprocess.run(base + cmd, env=env, capture_output=True,
                           text=True, timeout=900)
        assert r.returncode == 0, (cmd[0], r.stdout[-800:], r.stderr[-800:])

    report = json.load(open(tmp_path / "exp_e2e" / "subj_1" /
                            "metrics_enhance.json"))
    assert "ssim" in report and "psnr" in report
