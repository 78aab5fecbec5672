"""Test configuration: force an 8-device virtual CPU backend.

This is the TPU-world "fake cluster" (SURVEY.md section 4): all sharding
logic (mesh construction, GSPMD batch sharding, collective insertion) is
exercised on 8 virtual CPU devices without TPU hardware.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (a tunneled
# TPU whose compiles block 20-40 s), which is wrong for unit tests. Set
# NEURONS_TPU_TEST_ON_TPU=1 to run the (separate) TPU kernel tests.
# A pytest plugin may import jax before this conftest, so set the platform
# through jax.config (effective until backend init) as well as the env.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("NEURONS_TPU_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" or \
    os.environ.get("NEURONS_TPU_TEST_ON_TPU"), (
        "tests must run on the virtual CPU mesh; jax backend was "
        "initialized before conftest could force it")

# Persistent compilation cache: XLA compiles block on a slow path in this
# environment (~10-60 s wall each), so cache aggressively across runs —
# in the host-partitioned dir (see neurons_tpu/utils/compile_cache.py).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurons_tpu.utils import compile_cache  # noqa: E402

compile_cache.setup("cpu")

# Tests are synthetic by definition: permit the byte-level tokenizer
# stand-in (real runs hard-error without the CLIP BPE asset — see
# neurons_tpu/data/clip_tokenizer.py).
os.environ.setdefault("NEURONS_TPU_ALLOW_BYTE_TOKENIZER", "1")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from neurons_tpu.parallel import create_mesh
    from neurons_tpu.config import MeshConfig

    return create_mesh(MeshConfig(data=-1))


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
