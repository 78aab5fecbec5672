"""Multi-host bootstrap + collectives glue — the NCCL/Accelerate layer.

The reference's distributed substrate is HF Accelerate over torch
.distributed/NCCL: process-group init (reference train_neurons.py:668),
rank from env (reference train_neurons.py:656-661), the
`wait_for_everyone()` barrier (reference train_neurons.py:642), rank-0
gating (reference train_neurons.py:683, :557), rendezvous via MASTER_PORT
(reference train_neurons.sh:3), and round-robin test-clip sharding
(reference scripts/neuroclips_video.py:39-40,323).

TPU-native equivalents (SURVEY.md §2e): `jax.distributed.initialize()`
per host, GSPMD collectives over ICI/DCN, and
`jax.experimental.multihost_utils` for barriers / host-0 broadcast. All
functions are single-process no-ops so the same code path runs on one
chip, the 8-device CPU test mesh, or a multi-host slice.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the jax.distributed process group (the Accelerate init,
    reference train_neurons.py:668). Arguments default from the standard
    env (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — or the
    torchrun-style MASTER_ADDR/MASTER_PORT, WORLD_SIZE, RANK the
    reference uses, train_neurons.py:656-661). Returns True if a
    multi-process group was initialized; False for single-process runs
    (no-op). On Cloud TPU pods with no explicit env, jax.distributed
    auto-detects — pass coordinator_address="auto" to force that path."""
    if coordinator_address == "auto":
        jax.distributed.initialize()
        return True
    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and "MASTER_ADDR" in os.environ:
        coordinator_address = (f"{os.environ['MASTER_ADDR']}:"
                               f"{os.environ.get('MASTER_PORT', '12355')}")
    if coordinator_address is None:
        return False  # single process
    num_processes = num_processes or int(
        os.environ.get("NUM_PROCESSES", os.environ.get("WORLD_SIZE", "1")))
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", os.environ.get("RANK", "0")))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_main_process() -> bool:
    """Rank-0 gate (the reference's accelerator.is_main_process)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Block until every host arrives (the reference's
    accelerator.wait_for_everyone(), train_neurons.py:642). Implemented
    as a tiny named psum across all devices."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def broadcast_from_host0(tree):
    """Ship host-0's pytree to every process (used to agree on e.g.
    sampled eval indices; the reference relies on identical seeding
    instead). Single-process: identity."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


def process_allgather(tree):
    """Gather per-host arrays to all hosts (the reference's
    accelerator.gather, utils.py:118-123). Single-process: adds a leading
    axis of size 1 to mirror the multihost contract."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)


def round_robin_indices(total: int, shard: Optional[int] = None,
                        num_shards: Optional[int] = None) -> np.ndarray:
    """The stage-5 clip split `org_idx = rank + i * num_devices`
    (reference scripts/neuroclips_video.py:39-40,323). Defaults to this
    process's rank over all processes."""
    shard = jax.process_index() if shard is None else shard
    num_shards = jax.process_count() if num_shards is None else num_shards
    return np.arange(shard, total, num_shards)
