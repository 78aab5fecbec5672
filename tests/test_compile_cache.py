"""compile_cache: CPUID-partitioned persistent-cache hygiene
(neurons_tpu/utils/compile_cache.py; round-2 driver logs were drowned
in cpu_aot_loader errors — see the module docstring for the diagnosis).
"""

import os

import jax

from neurons_tpu.utils import compile_cache as cc


class TestFingerprint:
    def test_deterministic_and_short(self):
        a, b = cc.host_fingerprint(), cc.host_fingerprint()
        assert a == b
        assert len(a) == 12
        int(a, 16)  # hex

    def test_cache_dir_partitioning(self, tmp_path):
        root = str(tmp_path)
        tpu = cc.cache_dir("tpu", root)
        cpu = cc.cache_dir("cpu", root)
        assert tpu.endswith(os.path.join(root, "tpu"))
        assert os.path.basename(cpu).startswith("hv2-")
        assert tpu != cpu


class TestPrune:
    def test_setup_prunes_legacy_layouts(self, tmp_path):
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "h-deadbeef0000"))
        with open(os.path.join(root, "h-deadbeef0000", "x-cache"),
                  "w") as f:
            f.write("poisoned")
        with open(os.path.join(root, "jit_f-1234-cache"), "w") as f:
            f.write("flat legacy")
        keep = os.path.join(root, "tpu")
        os.makedirs(keep)
        with open(os.path.join(keep, "jit_g-5678-cache"), "w") as f:
            f.write("current layout, kept")

        prev = jax.config.jax_compilation_cache_dir
        try:
            d = cc.setup("cpu", root=root)
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
        assert not os.path.exists(os.path.join(root, "h-deadbeef0000"))
        assert not os.path.exists(os.path.join(root, "jit_f-1234-cache"))
        assert os.path.exists(os.path.join(keep, "jit_g-5678-cache"))
        assert os.path.isdir(d) and os.path.basename(d).startswith("hv2-")


class TestNoPersistence:
    def test_context_restores_flag(self):
        before = jax.config.jax_enable_compilation_cache
        with cc.no_persistence():
            assert jax.config.jax_enable_compilation_cache is False
        assert jax.config.jax_enable_compilation_cache == before
