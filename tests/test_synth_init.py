"""synth_params: host-filled parameter trees match the real init's
structure/shapes at flax-like scales (neurons_tpu/utils/synth_init.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from neurons_tpu.utils.synth_init import synth_params


class _Toy(nn.Module):
    @nn.compact
    def __call__(self, x, idx):
        x = nn.Conv(8, (3, 3), name="conv")(x)
        x = nn.GroupNorm(num_groups=2, name="gn")(x)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(16, name="dense")(x)
        emb = nn.Embed(10, 16, name="embed")(idx)
        return x + emb


class TestSynthParams:
    def _trees(self, dtype):
        m = _Toy()
        x = jnp.zeros((2, 8, 8, 4))
        idx = jnp.zeros((2,), jnp.int32)
        init_fn = lambda: m.init(jax.random.PRNGKey(0), x, idx)["params"]
        real = init_fn()
        synth = synth_params(init_fn, dtype=dtype)
        return real, synth

    def test_structure_shapes_dtype(self):
        real, synth = self._trees(jnp.bfloat16)
        rt = jax.tree_util.tree_structure(real)
        st = jax.tree_util.tree_structure(synth)
        assert rt == st
        for r, s in zip(jax.tree_util.tree_leaves(real),
                        jax.tree_util.tree_leaves(synth)):
            assert r.shape == s.shape
            assert s.dtype == jnp.bfloat16

    def test_fill_rules(self):
        _, synth = self._trees(jnp.float32)
        assert (np.asarray(synth["dense"]["bias"]) == 0).all()
        assert (np.asarray(synth["gn"]["scale"]) == 1).all()
        assert (np.asarray(synth["gn"]["bias"]) == 0).all()
        k = np.asarray(synth["dense"]["kernel"], np.float32)
        fan_in = k.shape[0]
        # lecun-uniform bounds: |w| <= sqrt(3/fan_in), nonzero, std close
        assert np.abs(k).max() <= np.sqrt(3.0 / fan_in) + 1e-6
        assert np.abs(k).max() > 0
        assert abs(k.std() - 1 / np.sqrt(fan_in)) < 0.3 / np.sqrt(fan_in)
        e = np.asarray(synth["embed"]["embedding"], np.float32)
        assert 0.005 < e.std() < 0.04  # ~N-equivalent 0.02 scale
        c = np.asarray(synth["conv"]["kernel"], np.float32)
        assert np.abs(c).max() <= np.sqrt(3.0 / (3 * 3 * 4)) + 1e-6

    def test_deterministic_per_seed(self):
        _, a = self._trees(jnp.float32)
        _, b = self._trees(jnp.float32)
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
