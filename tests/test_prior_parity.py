"""Golden numerics: flax PriorNetwork vs the torch dalle2 replica through
the real importer (`_dalle2_prior_net`). Covers the forward (with CFG
null-substitution branches) that drives the 100-step stage-3 prior loop
(reference BrainModel_neurons.py:484-686); full-width parity lives in
tools/fullwidth_parity.py (QUALITY json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from neurons_tpu.config import PriorConfig
from neurons_tpu.interop.torch_import import _dalle2_prior_net
from neurons_tpu.models.prior import PriorNetwork

from torch_prior_replica import TorchPriorNetwork

CFG = PriorConfig(dim=32, depth=2, dim_head=12, heads=4, num_tokens=6,
                  timesteps=5)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(3)
    tm = TorchPriorNetwork(CFG).eval()
    sd = {f"diffusion_prior.net.{k}": v for k, v in tm.state_dict().items()}
    params = _dalle2_prior_net(_tracker(sd), CFG.depth)
    return tm, params


def _tracker(sd):
    from neurons_tpu.interop.torch_import import _Tracker
    return _Tracker(sd)


def _inputs(seed, b=2):
    rs = np.random.RandomState(seed)
    img = rs.randn(b, CFG.num_tokens, CFG.dim).astype(np.float32)
    brain = rs.randn(b, CFG.num_tokens, CFG.dim).astype(np.float32)
    t = np.asarray(rs.randint(0, CFG.timesteps, (b,)), np.float32)
    return img, brain, t


class TestPriorParity:
    def test_forward_matches_torch(self, pair):
        tm, params = pair
        img, brain, t = _inputs(0)
        with torch.no_grad():
            want = tm(torch.from_numpy(img), torch.from_numpy(t),
                      torch.from_numpy(brain)).numpy()
        got = np.asarray(PriorNetwork(CFG).apply(
            {"params": params}, jnp.asarray(img), jnp.asarray(t),
            jnp.asarray(brain)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_null_branches_match_torch(self, pair):
        """CFG null substitution (drop prob 1.0) equals the torch
        explicit null-embed path."""
        tm, params = pair
        img, brain, t = _inputs(1)
        with torch.no_grad():
            want = tm(torch.from_numpy(img), torch.from_numpy(t),
                      torch.from_numpy(brain), drop_brain=True,
                      drop_image=True).numpy()
        got = np.asarray(PriorNetwork(CFG).apply(
            {"params": params}, jnp.asarray(img), jnp.asarray(t),
            jnp.asarray(brain), brain_cond_drop_prob=1.0,
            image_cond_drop_prob=1.0))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_hoisted_bias_matches_torch(self, pair):
        """The step-invariant precomputed rel-pos bias path (what the
        bench/pipeline use inside the 100-step scan) stays golden."""
        from neurons_tpu.models.prior import prior_attn_bias
        tm, params = pair
        img, brain, t = _inputs(2)
        bias = prior_attn_bias(params, CFG.num_tokens)
        with torch.no_grad():
            want = tm(torch.from_numpy(img), torch.from_numpy(t),
                      torch.from_numpy(brain)).numpy()
        got = np.asarray(PriorNetwork(CFG).apply(
            {"params": params}, jnp.asarray(img), jnp.asarray(t),
            jnp.asarray(brain), attn_bias=bias))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_importer_consumes_all_prior_keys(self, pair):
        tm, _ = pair
        sd = {f"diffusion_prior.net.{k}": v
              for k, v in tm.state_dict().items()}
        tr = _tracker(sd)
        _dalle2_prior_net(tr, CFG.depth)
        unused = sorted(set(sd) - tr.used)
        assert unused == [], unused
