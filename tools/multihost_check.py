"""Real >=2-process rendezvous + sharded step — executable proof.

Every prior round exercised `parallel/distributed.py` only as a
single-process no-op (tests/test_mesh.py pins those semantics). This
tool launches TWO actual OS processes on localhost, each owning 4
virtual CPU devices, and drives the full multi-process surface the
reference gets from `accelerate launch` + torch.distributed/NCCL
(reference train_neurons.sh:92-96 spawns ranks; train_neurons.py:668
init; :642 wait_for_everyone; :656-661 rank env):

  - rendezvous via the torchrun-style env `distributed.initialize`
    advertises (MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK),
  - `barrier()` across processes,
  - `broadcast_from_host0` (rank 1 must receive rank 0's tree),
  - `process_allgather` (both ranks' shards visible everywhere),
  - `round_robin_indices` (the stage-5 clip split by rank),
  - ONE pjit stage-1 train step over a GLOBAL 8-device mesh spanning
    both processes (4 local + 4 remote devices per rank), batch sharded
    over `data`, loss identical on both ranks.

Run:  python tools/multihost_check.py            -> MULTIHOST_r04.json
Also exercised by tests/test_multiprocess.py (marked slow).
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_N_PROC = 2
_LOCAL_DEVICES = 4

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["NEURONS_TPU_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ["NEURONS_TPU_LOCAL_DEVICES"]).strip()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from neurons_tpu.parallel import distributed as D

# 1) rendezvous purely from the torchrun-style env (no explicit args)
assert D.initialize() is True, "initialize() must join a 2-proc group"
rank = jax.process_index()
out = {"rank": rank,
       "process_count": jax.process_count(),
       "global_devices": len(jax.devices()),
       "local_devices": len(jax.local_devices())}

# 2) barrier (would hang forever if rendezvous were fake)
D.barrier("multihost-check")

# 3) host-0 broadcast: rank 1 feeds garbage in, must get rank 0's tree
seed_tree = {"idx": np.arange(8) * (1 if rank == 0 else -1000),
             "lr": np.float32(5e-5 if rank == 0 else 0.0)}
got = D.broadcast_from_host0(seed_tree)
np.testing.assert_array_equal(np.asarray(got["idx"]), np.arange(8))
assert float(np.asarray(got["lr"])) == np.float32(5e-5)
out["broadcast_ok"] = True

# 4) allgather: every rank's contribution visible everywhere, in order
mine = np.full((3,), rank, np.int32)
all_ = np.asarray(D.process_allgather(mine))
np.testing.assert_array_equal(all_, np.stack([np.full((3,), r, np.int32)
                                              for r in range(2)]))
out["allgather_ok"] = True

# 5) the reference's round-robin clip split by rank
np.testing.assert_array_equal(D.round_robin_indices(10),
                              np.arange(rank, 10, 2))

# 6) one REAL pjit train step over the global mesh spanning both
# processes: tiny stage-1, batch over `data` (all 8 global devices),
# per-process local data assembled into a global array
from neurons_tpu.config import BrainModelConfig, MeshConfig, TrainConfig
from neurons_tpu.parallel import create_mesh
from neurons_tpu.training import train_brain as tb

mesh = create_mesh(MeshConfig(data=-1))
assert mesh.devices.size == 8, mesh
bcfg = BrainModelConfig(hidden_dim=32, n_blocks=1, seq_len=1,
                        clip_seq_dim=16, clip_emb_dim=32,
                        clip_txt_emb_dim=24, subjects=(3,))
tcfg = TrainConfig(batch_size=8, num_epochs=2, max_lr=1e-3)
model, state, tx = tb.init_stage1(bcfg, tcfg, steps_per_epoch=2,
                                  key=jax.random.PRNGKey(0))
# replicate over the GLOBAL mesh: plain device_put cannot target the
# other process's devices — assemble from process-local data (both
# ranks computed identical params from the same PRNGKey)
rep = NamedSharding(mesh, P())
state = jax.tree_util.tree_map(
    lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
    state)

B = tcfg.batch_size  # global batch; each process holds B//2 samples
g = np.random.default_rng(7)  # same stream everywhere; slice by rank
def global_batch(shape):
    full = g.normal(size=(B,) + shape).astype(np.float32)
    local = full[rank * (B // 2):(rank + 1) * (B // 2)]
    sh = NamedSharding(mesh, P("data", *([None] * len(shape))))
    return jax.make_array_from_process_local_data(sh, local,
                                                  global_shape=full.shape)

vox = global_batch((1, bcfg.voxel_counts[0]))
ct = global_batch((bcfg.clip_seq_dim, bcfg.clip_emb_dim))
te = global_batch((bcfg.clip_txt_emb_dim,))
step = tb.make_stage1_train_step(model, tx, tcfg)
key_g = jax.make_array_from_process_local_data(
    rep, np.asarray(jax.random.PRNGKey(1)))
state2, metrics = step(state, key_g, vox, ct, te)
loss = float(np.asarray(jax.device_get(metrics["loss"])))
assert np.isfinite(loss), loss
out["step_loss"] = loss
out["step_count"] = int(np.asarray(jax.device_get(state2.step)))

# losses must agree bit-for-bit across ranks (same global computation)
losses = np.asarray(D.process_allgather(np.float64(loss)))
assert losses.shape[0] == 2 and losses[0] == losses[1], losses
out["loss_identical_across_ranks"] = True

D.barrier("multihost-check-done")
with open(os.environ["NEURONS_TPU_MH_OUT"], "w") as f:
    json.dump(out, f)
print(f"rank {rank} OK: {out}", flush=True)
"""


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_check(timeout: int = 900) -> dict:
    """Spawn the 2-process group; return the merged per-rank reports."""
    port = free_port()
    tmp = tempfile.mkdtemp(prefix="multihost_")
    procs, outs = [], []
    for rank in range(_N_PROC):
        out_path = os.path.join(tmp, f"rank{rank}.json")
        outs.append(out_path)
        env = dict(
            os.environ,
            MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
            WORLD_SIZE=str(_N_PROC), RANK=str(rank),
            NEURONS_TPU_REPO=_REPO, NEURONS_TPU_MH_OUT=out_path,
            NEURONS_TPU_LOCAL_DEVICES=str(_LOCAL_DEVICES),
            JAX_PLATFORMS="cpu")
        env.pop("PYTHONPATH", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = [p.communicate(timeout=timeout)[0] for p in procs]
    for rank, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"rank {rank} failed rc={p.returncode}:\n{log[-4000:]}")
    ranks = [json.load(open(o)) for o in outs]
    return {"ok": True, "n_processes": _N_PROC,
            "local_devices_per_process": _LOCAL_DEVICES,
            "rendezvous": "torchrun-style env (MASTER_ADDR/PORT, "
                          "WORLD_SIZE, RANK) via parallel.distributed"
                          ".initialize",
            "ranks": ranks}


def main():
    doc = run_check()
    out = os.path.join(_REPO, "MULTIHOST_r04.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc, indent=2))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
