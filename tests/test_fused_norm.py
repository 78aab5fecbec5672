"""Fused GroupNorm+SiLU kernel: interpreter-mode parity vs XLA composite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.ops import fused_norm as F


def test_reference_matches_flax_groupnorm(rng):
    import flax.linen as nn

    x = jax.random.normal(rng, (2, 8, 8, 16))
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (16,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (16,)) * 0.1

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = {"params": {"scale": scale, "bias": bias}}
    expected = nn.silu(gn.apply(params, x))
    got = F.group_norm_silu_reference(x, scale, bias, groups=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_pallas_kernel_interpret_mode(rng):
    """The Pallas kernel (interpret=True on CPU) matches the composite."""
    x = jax.random.normal(rng, (2, 4, 4, 16))
    scale = jnp.ones((16,)) * 1.5
    bias = jnp.ones((16,)) * 0.2
    ref = F.group_norm_silu_reference(x, scale, bias, groups=4)
    got = F._pallas_gn_silu(x, scale, bias, groups=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_flow(rng):
    x = jax.random.normal(rng, (1, 4, 4, 8))
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))

    def loss(x, s, b):
        return jnp.sum(F.group_norm_silu(x, s, b, 4))

    gx, gs, gb = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
    assert np.isfinite(np.asarray(gx)).all()
    assert gx.shape == x.shape and gs.shape == scale.shape
    # numeric check against the composite's grad
    def loss_ref(x, s, b):
        return jnp.sum(F.group_norm_silu_reference(x, s, b, 4))
    gx2 = jax.grad(loss_ref)(x, scale, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-4,
                               atol=1e-5)


def test_pallas_kernel_large_mean_stability(rng):
    """Large-mean channels (|mean| >> std) catastrophically cancel under
    single-pass E[x^2]-mean^2 variance; the kernel must use the two-pass
    centered form."""
    x = jax.random.normal(rng, (1, 8, 8, 16)) * 0.05 + 50.0
    scale = jnp.ones((16,))
    bias = jnp.zeros((16,))
    ref = F.group_norm_silu_reference(x, scale, bias, groups=4)
    got = F._pallas_gn_silu(x, scale, bias, groups=4, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
