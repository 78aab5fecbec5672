"""Golden-shape and behavior tests for the brain-decoding models
(vs reference model_variants/BrainModel_neurons.py shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from neurons_tpu.config import BrainModelConfig
from neurons_tpu.models import brain


CFG = BrainModelConfig(hidden_dim=64, n_blocks=2, seq_len=1, clip_seq_dim=16,
                       clip_emb_dim=32, clip_txt_emb_dim=24)


def test_ridge_shapes(rng):
    m = brain.RidgeRegression(input_sizes=(100,), out_features=64, seq_len=1)
    x = jnp.ones((4, 1, 100))
    params = m.init(rng, x)
    y = m.apply(params, x)
    assert y.shape == (4, 1, 64)


def test_backbone_shapes(rng):
    m = brain.BrainBackbone(CFG)
    x = jnp.ones((4, 1, 64))
    params = m.init(rng, x)
    voxels_embed, clip_embed = m.apply(params, x)
    assert voxels_embed.shape == (4, 16, 32)
    assert clip_embed.shape == (4, 16, 32)


def test_backbone_jits_deterministically(rng):
    m = brain.BrainBackbone(CFG)
    x = jax.random.normal(rng, (2, 1, 64))
    params = m.init(rng, x)
    f = jax.jit(lambda p, x: m.apply(p, x)[1])
    y1 = f(params, x)
    y2 = f(params, x)
    np.testing.assert_allclose(y1, y2, rtol=1e-6)


def test_backbone_seqlen1_mixer_degeneracy(rng):
    """With seq_len=1 (the NEURONS setting, reference train_neurons.py:70)
    mixer_block2's LayerNorm normalizes a size-1 axis to zero, making each
    block-2 output input-independent; the residual chain then reduces the
    whole mixer to `x + const`. The reference's torch code has the identical
    degeneracy — we reproduce it faithfully and pin it here."""
    m = brain.BrainBackbone(CFG)
    x1 = jax.random.normal(rng, (2, 1, 64))
    x2 = x1 + 1.5
    params = m.init(rng, x1)

    def mixer_out(params, x):
        # re-run just the mixer portion by subtracting the constant path
        return m.apply(params, x)[0]

    # voxels_embed is backbone_linear(mixer(x)); mixer(x) = x + const
    # => voxels_embed(x2) - voxels_embed(x1) == backbone_linear(x2 - x1) - bias-term
    d_embed = np.asarray(mixer_out(params, x2) - mixer_out(params, x1))
    w = np.asarray(params["params"]["backbone_linear"]["kernel"])
    expected = (np.asarray(x2 - x1).reshape(2, -1) @ w).reshape(d_embed.shape)
    np.testing.assert_allclose(d_embed, expected, rtol=1e-3, atol=1e-4)


def test_backbone_dropout_active_with_seqlen2(rng):
    """With seq_len >= 2 the mixer is non-degenerate and dropout must
    perturb the output."""
    cfg2 = brain.BrainModelConfig(hidden_dim=64, n_blocks=2, seq_len=2,
                                  clip_seq_dim=16, clip_emb_dim=32,
                                  clip_txt_emb_dim=24, dropout=0.5)
    m = brain.BrainBackbone(cfg2)
    x = jax.random.normal(rng, (2, 2, 64))
    params = m.init(rng, x)
    y1 = m.apply(params, x)[1]
    yd = m.apply(params, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(7)})[1]
    assert not np.allclose(np.asarray(y1), np.asarray(yd))


def test_clipproj_pools_tokens(rng):
    m = brain.CLIPProj(in_dim=32, out_dim=24)
    x = jax.random.normal(rng, (4, 16, 32))
    params = m.init(rng, x)
    y = m.apply(params, x)
    assert y.shape == (4, 24)
    # permuting tokens must not change the pooled projection
    y2 = m.apply(params, x[:, ::-1])
    np.testing.assert_allclose(y, y2, rtol=1e-4, atol=1e-6)


def test_motionproj_layout(rng):
    """The frame split is channel-major: feature j of frame f comes from
    output column j * n_frames + f (reference BrainModel_neurons.py:127)."""
    n_frames, c, n = 3, 8, 16
    m = brain.MotionProj(n_frames=n_frames, clip_size=c)
    x = jax.random.normal(rng, (2, n, c))
    params = m.init(rng, x)
    y = m.apply(params, x)
    assert y.shape == (2, n_frames, n, c)

    # check against a manual einops-free computation
    w = params["params"]["motion_proj"]["kernel"]
    b = params["params"]["motion_proj"]["bias"]
    raw = np.asarray(x @ w + b)  # [2, n, c * n_frames]
    manual = raw.reshape(2, n, c, n_frames).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(y), manual, rtol=1e-5)


def test_classifier_shapes(rng):
    m = brain.MultiLabelClassifier(in_channel_text=24, class_num=7)
    x = jnp.ones((4, 32))
    params = m.init(rng, x)
    y = m.apply(params, x)
    assert y.shape == (4, 7)


def test_full_voxel_to_clip_path(rng):
    """The innermost trainable path (SURVEY.md section 3.5): voxel -> ridge ->
    backbone -> (voxels_embed, clip_vision_embed)."""
    ridge = brain.RidgeRegression(input_sizes=(100,), out_features=64)
    backbone = brain.BrainBackbone(CFG)
    voxel = jax.random.normal(rng, (4, 1, 100))
    rp = ridge.init(rng, voxel)
    hidden = ridge.apply(rp, voxel)
    bp = backbone.init(rng, hidden)
    _, clip_embed = backbone.apply(bp, hidden)
    assert clip_embed.shape == (4, 16, 32)
    assert np.isfinite(np.asarray(clip_embed)).all()


class TestPriorAttnBiasHoist:
    def test_precomputed_bias_matches_default(self, rng):
        """prior_attn_bias (hoisted out of the sampling scan) reproduces
        the in-module RelPosBias exactly."""
        from neurons_tpu.config import PriorConfig
        from neurons_tpu.models.prior import PriorNetwork, prior_attn_bias

        cfg = PriorConfig(num_tokens=6, dim=16, depth=1, dim_head=8,
                          heads=2)
        net = PriorNetwork(cfg)
        x = jax.random.normal(rng, (2, 6, 16))
        t = jnp.array([3, 7])
        brain = jax.random.normal(jax.random.fold_in(rng, 1), (2, 6, 16))
        params = net.init(jax.random.PRNGKey(0), x, t, brain)["params"]
        base = net.apply({"params": params}, x, t, brain)
        bias = prior_attn_bias(params, cfg.num_tokens)
        assert bias.shape == (cfg.heads, 13, 14)
        hoisted = net.apply({"params": params}, x, t, brain,
                            attn_bias=bias)
        np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)
