"""Mesh/sharding tests on the 8-device virtual CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neurons_tpu.config import MeshConfig
from neurons_tpu.parallel import (create_mesh, data_sharding, shard_batch)
from neurons_tpu.parallel.mesh import replicate


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_create_mesh_default():
    mesh = create_mesh(MeshConfig(data=-1))
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_create_mesh_2d():
    mesh = create_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape["data"] == 4
    assert mesh.shape["model"] == 2


def test_shard_batch_places_on_data_axis(mesh8):
    batch = {"voxel": np.ones((16, 1, 100), np.float32),
             "label": np.arange(16)}
    sharded = shard_batch(mesh8, batch)
    shard_shapes = [s.data.shape for s in sharded["voxel"].addressable_shards]
    assert all(s == (2, 1, 100) for s in shard_shapes)


def test_psum_gradient_allreduce(mesh8):
    """A sharded-batch loss gradient equals the full-batch gradient — the
    GSPMD equivalent of DDP's gradient all-reduce."""
    w = jnp.ones((4,))
    x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_full = jax.grad(loss)(w, jnp.asarray(x))

    xs = jax.device_put(x, data_sharding(mesh8, 2))
    wr = replicate(mesh8, w)
    g_sharded = jax.jit(jax.grad(loss))(wr, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_full),
                               rtol=1e-5)


def test_attention_fallback_path():
    from neurons_tpu.ops import dot_product_attention
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 10, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 12, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 12, 16))
    out = dot_product_attention(q, k, v)
    assert out.shape == (2, 4, 10, 16)
    # softmax rows sum to one -> output within convex hull of v rows
    assert np.isfinite(np.asarray(out)).all()


def test_attention_matches_explicit_softmax():
    from neurons_tpu.ops.attention import xla_attention
    g = np.random.default_rng(3)
    q = g.normal(size=(1, 2, 5, 8)).astype(np.float32)
    k = g.normal(size=(1, 2, 7, 8)).astype(np.float32)
    v = g.normal(size=(1, 2, 7, 8)).astype(np.float32)
    out = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v)))
    scale = 8 ** -0.5
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", w, v)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


class TestFsdpSharding:
    def test_big_leaves_shard_small_replicate(self):
        import jax
        from jax.sharding import PartitionSpec as P
        from neurons_tpu.config import MeshConfig
        from neurons_tpu.parallel import create_mesh, fsdp_sharding

        mesh = create_mesh(MeshConfig(data=-1))
        big = np.zeros((1024, 256), np.float32)
        small = np.zeros((7,), np.float32)
        s_big = fsdp_sharding(mesh, big)
        s_small = fsdp_sharding(mesh, small)
        assert s_big.spec == P("data", None)
        assert s_small.spec == P()
        # indivisible largest dim falls through to the next divisible one
        odd = np.zeros((1023, 256), np.float32)
        assert fsdp_sharding(mesh, odd).spec == P(None, "data")

    def test_sharded_opt_state_still_trains(self):
        import jax
        import jax.numpy as jnp
        import optax
        from neurons_tpu.config import MeshConfig
        from neurons_tpu.parallel import create_mesh, shard_opt_state

        mesh = create_mesh(MeshConfig(data=-1))
        params = {"w": jnp.ones((1024, 64)), "b": jnp.zeros((7,))}
        tx = optax.adamw(1e-2)
        opt_state = shard_opt_state(mesh, tx.init(params))

        @jax.jit
        def step(params, opt_state):
            grads = jax.tree.map(jnp.ones_like, params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        p2, o2 = step(params, opt_state)
        assert np.isfinite(np.asarray(p2["w"])).all()
        assert float(jnp.abs(p2["w"] - params["w"]).max()) > 0


# ---------------------------------------------------------------------------
# multi-host glue (parallel/distributed.py) — single-process semantics
# ---------------------------------------------------------------------------

class TestDistributedGlue:
    def test_initialize_noop_without_env(self, monkeypatch):
        from neurons_tpu.parallel import distributed as D
        for var in ("JAX_COORDINATOR_ADDRESS", "MASTER_ADDR", "RANK",
                    "WORLD_SIZE"):
            monkeypatch.delenv(var, raising=False)
        assert D.initialize() is False

    def test_initialize_noop_world_size_one(self, monkeypatch):
        from neurons_tpu.parallel import distributed as D
        monkeypatch.setenv("MASTER_ADDR", "127.0.0.1")
        monkeypatch.setenv("WORLD_SIZE", "1")
        assert D.initialize() is False

    def test_single_process_barrier_and_broadcast(self):
        from neurons_tpu.parallel import distributed as D
        D.barrier("test")  # no-op, must not raise
        tree = {"a": np.arange(3)}
        out = D.broadcast_from_host0(tree)
        np.testing.assert_array_equal(out["a"], tree["a"])
        assert D.is_main_process()

    def test_process_allgather_adds_axis(self):
        from neurons_tpu.parallel import distributed as D
        out = D.process_allgather({"x": np.ones((2, 3))})
        assert out["x"].shape == (1, 2, 3)

    def test_round_robin_matches_reference_split(self):
        from neurons_tpu.parallel import distributed as D
        # reference scripts/neuroclips_video.py:39-40: rank + i*N
        idx = D.round_robin_indices(10, shard=1, num_shards=4)
        np.testing.assert_array_equal(idx, [1, 5, 9])
        all_idx = np.sort(np.concatenate(
            [D.round_robin_indices(10, s, 4) for s in range(4)]))
        np.testing.assert_array_equal(all_idx, np.arange(10))


class TestShardOptStateLike:
    def test_moments_adopt_param_sharding(self):
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from neurons_tpu.config import MeshConfig
        from neurons_tpu.parallel import create_mesh, shard_opt_state_like

        mesh = create_mesh(MeshConfig(data=4, model=2))
        params = {
            "wide": jax.device_put(jnp.zeros((16, 64)),
                                   NamedSharding(mesh, P(None, "model"))),
            "small": jax.device_put(jnp.zeros((8,)),
                                    NamedSharding(mesh, P())),
        }
        tx = optax.adam(1e-3)
        opt_state = tx.init(jax.tree_util.tree_map(np.asarray, params))
        placed = shard_opt_state_like(mesh, opt_state, params,
                                      axis="data")
        mu = placed[0].mu
        # wide moment: param's model sharding + data refinement on the
        # largest divisible axis
        spec = mu["wide"].sharding.spec
        flat = []
        for s in spec:
            if s is not None:
                flat.extend(s if isinstance(s, tuple) else (s,))
        assert "model" in flat
        # update stays local: same sharding as the param on the model axis
        assert mu["wide"].sharding.is_equivalent_to(
            params["wide"].sharding, 2) or "data" in flat
        assert np.asarray(mu["small"]).shape == (8,)
