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
    """The Pallas kernel (interpret=True on CPU) matches the composite —
    with RANDOM per-channel scale/bias so a permuted or group-broadcast
    affine application cannot pass."""
    x = jax.random.normal(rng, (2, 4, 4, 16))
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (16,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (16,)) * 0.3
    ref = F.group_norm_silu_reference(x, scale, bias, groups=4)
    got = F._pallas_gn_silu(x, scale, bias, groups=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_flow(rng):
    x = jax.random.normal(rng, (1, 4, 4, 8))
    scale = jax.random.normal(jax.random.fold_in(rng, 3), (8,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(rng, 4), (8,)) * 0.2

    def loss(x, s, b):
        return jnp.sum(F.group_norm_silu(x, s, b, 4))

    gx, gs, gb = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
    assert np.isfinite(np.asarray(gx)).all()
    # all three grads vs the composite's (catches a swapped (ds, db)
    # tuple in _bwd — scale/bias share a shape so shapes can't)
    def loss_ref(x, s, b):
        return jnp.sum(F.group_norm_silu_reference(x, s, b, 4))
    gx2, gs2, gb2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), rtol=1e-4,
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


def test_groupnorm_silu_module_param_tree_and_ranks(rng):
    """GroupNormSiLU: identical param tree to nn.GroupNorm (checkpoint
    compatibility claim) and the non-4D reshape path groups like a flax
    GroupNorm on the flattened layout."""
    import flax.linen as nn

    m = F.GroupNormSiLU(num_groups=4, epsilon=1e-6)
    x4 = jax.random.normal(rng, (2, 4, 4, 16))
    params = m.init(jax.random.PRNGKey(0), x4)["params"]
    gn_params = nn.GroupNorm(num_groups=4).init(
        jax.random.PRNGKey(0), x4)["params"]
    assert set(params) == set(gn_params) == {"scale", "bias"}
    assert params["scale"].shape == gn_params["scale"].shape

    scale = jax.random.normal(jax.random.fold_in(rng, 1), (16,)) + 1.0
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (16,)) * 0.1
    p = {"params": {"scale": scale, "bias": bias}}
    out4 = m.apply(p, x4)
    ref4 = F.group_norm_silu_reference(x4, scale, bias, 4, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4),
                               rtol=1e-5, atol=1e-5)

    # 3D input [B, T, C]: same math as GroupNorm over (T, C/G) + SiLU
    x3 = jax.random.normal(jax.random.fold_in(rng, 5), (2, 10, 16))
    out3 = m.apply(p, x3)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    ref3 = nn.silu(gn.apply(p, x3))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               rtol=1e-5, atol=1e-5)
