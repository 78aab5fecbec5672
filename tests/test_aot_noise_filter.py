"""The spurious cpu_aot_loader stderr filter (neurons_tpu/utils/
compile_cache.py:install_spurious_aot_error_filter) — driver-critical:
both round-2 driver artifacts' tails were drowned in these E-logs.
Runs in a subprocess because the filter dups fd 2 and installs an
atexit hook (pytest's capture must stay untouched)."""

import os
import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent("""
    import sys
    from neurons_tpu.utils import compile_cache as cc

    cc.install_spurious_aot_error_filter()
    noise = ("E0000 00:00:00.0 1 cpu_aot_loader.cc:53] Machine type "
             "used for XLA:CPU compilation (+avx512fp16) does not match")
    # one multi-line noise burst + real diagnostics around it
    print("real line before", file=sys.stderr)
    print(noise, file=sys.stderr)
    print(noise, file=sys.stderr)
    print("real line after", file=sys.stderr)
    sys.stderr.flush()
    print("stdout untouched")
""")


def test_filter_drops_only_marker_lines_and_reports_count():
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "stdout untouched" in r.stdout
    # noise suppressed inline; everything else forwarded in order
    body = r.stderr.split("[compile_cache]")[0]
    assert "cpu_aot_loader.cc" not in body
    assert "real line before" in body
    assert "real line after" in body
    assert "suppressed 2 spurious cpu_aot_loader" in r.stderr
    # forensics: first + last suppressed line retained VERBATIM so an
    # upstream wording drift is auditable (VERDICT r3 weak #6)
    assert "first suppressed: E0000" in r.stderr
    assert "last suppressed: E0000" in r.stderr
    # no non-spurious loader lines -> no escalation
    assert "WARNING" not in r.stderr


def test_real_loader_failure_escalates_alongside_suppression():
    """A cpu_aot_loader line that does NOT match the spurious pattern is
    forwarded AND makes the exit summary loud when suppression was also
    active (a real load failure must never hide behind the filter)."""
    script = _SCRIPT.replace(
        'print("real line after", file=sys.stderr)',
        'print("E0000 cpu_aot_loader.cc:99] Failed to deserialize '
        'executable", file=sys.stderr)')
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "Failed to deserialize executable" in r.stderr  # forwarded
    assert "suppressed 2 spurious" in r.stderr
    assert "WARNING: 1 cpu_aot_loader line(s) did NOT match" in r.stderr


def test_partial_marker_lines_pass_through():
    # a line with only ONE of the two markers must NOT be eaten
    script = _SCRIPT.replace(
        '"used for XLA:CPU compilation (+avx512fp16) does not match")',
        '"only one marker present")')
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert r.stderr.count("cpu_aot_loader.cc") == 2
    assert "suppressed" not in r.stderr
