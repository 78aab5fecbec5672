"""Full-size stage-1 training on the 8-way mesh — executable proof.

Single-chip full-width stage 1 cannot fit a 16 GB v5e (the 4096x425984
backbone projection's f32 Adam state alone is ~21 GB — measured, see
tools/train_bench.py). This script RUNS the full-size step on an 8-device
virtual CPU mesh with the production shardings — TP on the wide
projection over `model`, ZeRO over `data` for the Adam moments, DP batch
— and prints the resulting per-device byte budget, proving the v5e-8
layout fits with headroom.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/stage1_fullsize_mesh_check.py
(slow on the 1-core container: one step of a 1.7B-param model; ~minutes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
from neurons_tpu.utils import compile_cache  # noqa: E402
compile_cache.setup("cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    from neurons_tpu.config import BrainModelConfig, MeshConfig, TrainConfig
    from neurons_tpu.parallel import create_mesh, shard_opt_state
    from neurons_tpu.training import train_brain as tb

    mesh = create_mesh(MeshConfig(data=4, model=2, frame=1))
    print(f"mesh: {dict(mesh.shape)}")

    bcfg = BrainModelConfig(subjects=(1,))  # FULL width: hidden 4096
    tcfg = TrainConfig(batch_size=32, num_epochs=30, max_lr=5e-5)
    model, state, tx = tb.init_stage1(bcfg, tcfg, steps_per_epoch=36,
                                      key=jax.random.PRNGKey(0))

    def param_sharding(path, x):
        names = [str(getattr(p, "key", "")) for p in path]
        if "backbone_linear" in names and x.ndim == 2:
            # 2-D: columns over model x data (8-way, ~0.87 GB/device)
            return NamedSharding(mesh, P(None, ("model", "data")))
        if "backbone_linear" in names and x.ndim == 1:
            return NamedSharding(mesh, P(("model", "data")))
        return NamedSharding(mesh, P())

    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(x, param_sharding(p, x)), state.params)
    # moments co-sharded with params (no resharding in the update)
    from neurons_tpu.parallel import shard_opt_state_like
    opt_state = shard_opt_state_like(mesh, state.opt_state, params)
    state = tb.TrainState(params, opt_state,
                          jax.device_put(state.step,
                                         NamedSharding(mesh, P())))

    # per-device budget accounting
    def shard_bytes(tree):
        """Bytes resident on device 0 (the real per-chip budget)."""
        dev0 = jax.devices()[0]
        total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "addressable_shards"):
                total += sum(s.data.nbytes for s in leaf.addressable_shards
                             if s.device == dev0)
            elif hasattr(leaf, "nbytes"):
                total += leaf.nbytes
        return total

    pb = shard_bytes(state.params)
    ob = shard_bytes(state.opt_state)
    print(f"per-device params: {pb / 1e9:.2f} GB, "
          f"opt state: {ob / 1e9:.2f} GB, "
          f"total static: {(pb + ob) / 1e9:.2f} GB (16 GB v5e budget)")

    step = tb.make_stage1_train_step(model, tx, tcfg)
    g = np.random.default_rng(0)
    B = tcfg.batch_size
    vox = jax.device_put(
        jnp.asarray(g.normal(size=(B, 1, bcfg.voxel_counts[0]))
                    .astype(np.float32)), NamedSharding(mesh, P("data")))
    ct = jax.device_put(
        jnp.asarray(g.normal(size=(B, bcfg.clip_seq_dim, bcfg.clip_emb_dim))
                    .astype(np.float32)), NamedSharding(mesh, P("data")))
    te = jax.device_put(
        jnp.asarray(g.normal(size=(B, bcfg.clip_txt_emb_dim))
                    .astype(np.float32)), NamedSharding(mesh, P("data")))

    if os.environ.get("MESH_CHECK_RUN") == "1":
        # NOTE: executing 8 virtual devices on a 1-core container can
        # starve the in-process AllReduce rendezvous (observed hang) —
        # execution is opt-in; the compile-time analysis below is the
        # portable proof.
        state, metrics = step(state, jax.random.PRNGKey(1), vox, ct, te)
        print(f"full-size stage-1 sharded step OK: "
              f"loss={float(metrics['loss']):.4f}")
        return

    # step is already jitted WITH donate_argnums — lower it directly so
    # the analysis sees the aliasing
    lowered = step.lower(state, jax.random.PRNGKey(1), vox, ct, te)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        gb = 1e9
        print(f"XLA memory analysis (per device): "
              f"args {ma.argument_size_in_bytes / gb:.2f} GB, "
              f"outputs {ma.output_size_in_bytes / gb:.2f} GB, "
              f"temps {ma.temp_size_in_bytes / gb:.2f} GB, "
              f"aliased {ma.alias_size_in_bytes / gb:.2f} GB")
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"peak per-device estimate: {peak / gb:.2f} GB "
              f"(16 GB v5e budget) -> "
              f"{'FITS' if peak < 16e9 else 'DOES NOT FIT'}")
    else:
        print("memory_analysis unavailable on this backend; compile OK")


if __name__ == "__main__":
    main()
