"""CLI surface: parser construction, stage registry, arg plumbing."""

import pytest

from neurons_tpu import cli


class TestParser:
    def test_all_stages_registered(self):
        for cmd in ("train-brain", "train-decoupler", "recon", "caption",
                    "video", "decoupled-eval", "eval", "precompute",
                    "pipeline"):
            args = None
            try:
                # --help raises SystemExit(0) after printing
                cli.main([cmd, "--help"])
            except SystemExit as e:
                args = e
            assert args is not None and args.code == 0

    def test_common_flags_parse(self):
        import argparse
        with pytest.raises(SystemExit) as e:
            cli.main(["recon", "--badflag"])
        assert e.value.code != 0

    def test_pipeline_rejects_unknown_stage(self):
        with pytest.raises(SystemExit):
            cli.main(["pipeline", "9", "--synthetic", "--tiny",
                      "--platform", "cpu"])
