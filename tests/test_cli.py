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


class TestFastPreset:
    def _ns(self, **kw):
        import argparse
        kw.setdefault("fast", None)
        kw.setdefault("tgate", 0)
        kw.setdefault("tgate_pab", 0)
        return argparse.Namespace(**kw)

    def test_quality_expands_per_stage(self):
        a = self._ns(fast="quality")
        cli._apply_fast_preset(a, "recon")
        assert (a.tgate, a.tgate_pab) == (33, 2)
        b = self._ns(fast="quality")
        cli._apply_fast_preset(b, "video")
        assert (b.tgate, b.tgate_pab) == (10, 2)

    def test_explicit_flag_wins(self):
        a = self._ns(fast="max", tgate=25)
        cli._apply_fast_preset(a, "recon")
        assert a.tgate == 25 and a.tgate_pab == 2

    def test_reentrant_across_pipeline_stages(self):
        # `pipeline` reuses one namespace: recon's expansion must not be
        # mistaken for an explicit flag when video expands next
        a = self._ns(fast="quality")
        cli._apply_fast_preset(a, "recon")
        cli._apply_fast_preset(a, "video")
        assert a.tgate == 10

    def test_off_is_noop(self):
        a = self._ns()
        cli._apply_fast_preset(a, "recon")
        assert (a.tgate, a.tgate_pab) == (0, 0)

    def test_parser_accepts_fast(self):
        with pytest.raises(SystemExit) as e:
            cli.main(["recon", "--fast", "nonsense"])
        assert e.value.code != 0

    def test_serve_preset_env_expansion(self, monkeypatch):
        for v in ("BENCH_TGATE", "BENCH_TGATE_VIDEO", "BENCH_TGATE_PAB",
                  "BENCH_TINY", "BENCH_PLATFORM"):  # all restored at teardown
            monkeypatch.delenv(v, raising=False)
        import argparse
        import os
        # stub the heavy build: we only assert the env expansion
        class _Boom(Exception):
            pass

        def boom(*a, **k):
            raise _Boom

        import neurons_tpu.serving as serving
        monkeypatch.setattr(serving, "build_bench_pipeline", boom)
        args = argparse.Namespace(tiny=True, platform="cpu",
                                  fast="quality", serve_batch=1,
                                  host="127.0.0.1", port=0,
                                  max_wait_ms=1.0)
        with pytest.raises(_Boom):
            cli.cmd_serve(args)
        assert os.environ["BENCH_TGATE"] == "33"
        assert os.environ["BENCH_TGATE_VIDEO"] == "10"
        assert os.environ["BENCH_TGATE_PAB"] == "2"

    def test_pipeline_parser_accepts_fast(self):
        # pipeline forwards one namespace through every stage; --fast
        # must parse there so `pipeline 35 --fast quality` works
        with pytest.raises(SystemExit) as e:
            cli.main(["pipeline", "--fast", "quality", "--help"])
        assert e.value.code == 0


class TestRecordSteady:
    """cli._record_steady: steady rate excludes the compile-carrying
    first batch; long runs additionally get first-/last-100-clip window
    rates (the no-leak evidence in the full-split drive artifact)."""

    def _marks(self, n, batch, first_s, per_clip):
        marks, t = [], 0.0
        for done in range(batch, n + 1, batch):
            t = first_s + (done - batch) * per_clip
            marks.append((done, t))
        return marks

    def test_steady_excludes_first_batch(self):
        cli._STAGE_STATS.clear()
        cli._record_steady("3", self._marks(20, 4, 60.0, 2.0), 4)
        s = cli._STAGE_STATS["3"]
        assert s["steady_s_per_clip"] == 2.0
        assert s["first_batch_s"] == 60.0
        assert "first100_s_per_clip" not in s  # run too short

    def test_window_rates_on_long_runs(self):
        cli._STAGE_STATS.clear()
        # 1200 clips at batch 4: constant 3 s/clip after the first batch
        cli._record_steady("5", self._marks(1200, 4, 120.0, 3.0), 4)
        s = cli._STAGE_STATS["5"]
        assert s["steady_s_per_clip"] == 3.0
        assert s["first100_s_per_clip"] == 3.0
        assert s["last100_s_per_clip"] == 3.0

    def test_window_rates_detect_slowdown(self):
        cli._STAGE_STATS.clear()
        marks, t = [], 0.0
        for done in range(4, 1201, 4):
            rate = 2.0 if done <= 600 else 4.0  # 2x slowdown mid-run
            t += rate * 4
            marks.append((done, t))
        cli._record_steady("5", marks, 4)
        s = cli._STAGE_STATS["5"]
        assert s["first100_s_per_clip"] == 2.0
        assert s["last100_s_per_clip"] == 4.0

    def test_single_batch_fallback(self):
        cli._STAGE_STATS.clear()
        cli._record_steady("4", [(4, 76.7)], 8)  # padded tail < batch
        s = cli._STAGE_STATS["4"]
        assert s["steady_s_per_clip"] == round(76.7 / 4, 3)


class TestLoopForensics:
    """cli._watchdog + _record_steady's setup/drain rows: the r4
    full-split drive had two silent ~14/21-min stalls and 1285 s of
    unattributed off-loop time (E2E_FULL_r04.json) — these make both
    visible in-flight."""

    def test_watchdog_fires_on_stall(self, capsys):
        marks = [(i, i * 2.0) for i in range(1, 20)]
        cli._watchdog("5", marks, 20, marks[-1][1] + 120.0)  # 120s batch
        out = capsys.readouterr().out
        assert "WATCHDOG" in out and "120.0s" in out

    def test_watchdog_quiet_on_steady(self, capsys):
        marks = [(i, i * 2.0) for i in range(1, 20)]
        cli._watchdog("5", marks, 20, marks[-1][1] + 2.0)
        assert "WATCHDOG" not in capsys.readouterr().out

    def test_watchdog_threshold_is_absolute_too(self, capsys):
        # 5x median but under 60 s absolute: stays quiet (short batches
        # legitimately vary; only real stalls matter)
        marks = [(i, i * 2.0) for i in range(1, 20)]
        cli._watchdog("3", marks, 20, marks[-1][1] + 11.0)
        assert "WATCHDOG" not in capsys.readouterr().out

    def test_drain_and_setup_recorded(self, monkeypatch):
        cli._STAGE_STATS.clear()
        cli._SETUP_S["5"] = 33.3
        marks = [(4, 60.0), (8, 68.0)]
        now = {"t": 0.0}
        monkeypatch.setattr(cli._time, "perf_counter", lambda: 100.0)
        # t0=10 -> loop elapsed 68 ends at t=78; drain = 100-10-68 = 22
        cli._record_steady("5", marks, 4, t0=10.0)
        s = cli._STAGE_STATS["5"]
        assert s["post_loop_drain_s"] == 22.0
        assert s["setup_s"] == 33.3
        assert "5" not in cli._SETUP_S  # consumed
