"""Parity + behavior tests for the autoencoding-training extras:
LPIPS, PatchGAN discriminator, GAN losses (training/perceptual.py) and
the regularizer/quantizer zoo (models/vq.py).

Torch fixtures are hand-built with the exact state-dict layouts of the
reference (lpips/loss/lpips.py vgg_lpips, lpips/model/model.py
NLayerDiscriminator, regularizers/quantize.py) — torchvision is not
available, so the VGG16 feature trunk is replicated conv-by-conv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from neurons_tpu.models import vq as VQ
from neurons_tpu.training import perceptual as P

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch LPIPS replica (reference lpips/loss/lpips.py)
# ---------------------------------------------------------------------------

class TVgg16(tnn.Module):
    PLAN = P._VGG_SLICES

    def __init__(self):
        super().__init__()
        cin = 3
        for si, (ch, idxs) in enumerate(self.PLAN):
            sl = tnn.Module()
            for ci in idxs:
                setattr(sl, str(ci), tnn.Conv2d(cin, ch, 3, padding=1))
                cin = ch
            setattr(self, f"slice{si + 1}", sl)

    def forward(self, x):
        taps = []
        for si, (ch, idxs) in enumerate(self.PLAN):
            if si:
                x = tF.max_pool2d(x, 2, 2)
            sl = getattr(self, f"slice{si + 1}")
            for ci in idxs:
                x = tF.relu(getattr(sl, str(ci))(x))
            taps.append(x)
        return taps


class TLPIPS(tnn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("shift_buf",
                             torch.tensor(P._SHIFT)[None, :, None, None])
        self.register_buffer("scale_buf",
                             torch.tensor(P._SCALE)[None, :, None, None])
        self.net = TVgg16()
        for k, ch in enumerate(P.LPIPS_CHNS):
            lin = tnn.Module()
            lin.model = tnn.Sequential(tnn.Dropout(),
                                       tnn.Conv2d(ch, 1, 1, bias=False))
            setattr(self, f"lin{k}", lin)

    def forward(self, x, y):
        def prep(t):
            return (t - self.shift_buf) / self.scale_buf

        fx, fy = self.net(prep(x)), self.net(prep(y))
        val = 0
        for k in range(len(P.LPIPS_CHNS)):
            def unit(t):
                return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (unit(fx[k]) - unit(fy[k])) ** 2
            head = getattr(self, f"lin{k}").model(d)
            val = val + head.mean([2, 3], keepdim=True)
        return val

    def lpips_state_dict(self):
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("shift_buf", "scaling_layer.shift")
            k = k.replace("scale_buf", "scaling_layer.scale")
            sd[k] = v
        return sd


class TestLPIPS:
    def test_parity(self):
        tm = TLPIPS().eval()
        params, unused = P.import_lpips(tm.lpips_state_dict())
        assert unused == [], unused
        x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
        y = np.random.RandomState(1).randn(2, 3, 16, 16).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x), torch.tensor(y)).numpy()
        got = P.LPIPS().apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1e-5)
        # identical inputs -> exactly zero distance
        z = P.LPIPS().apply({"params": params}, jnp.asarray(x),
                            jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# torch PatchGAN replica (reference lpips/model/model.py:17-88)
# ---------------------------------------------------------------------------

class TDisc(tnn.Module):
    def __init__(self, input_nc=3, ndf=8, n_layers=3):
        super().__init__()
        seq = [tnn.Conv2d(input_nc, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
        nf, nfp = 1, 1
        for n in range(1, n_layers):
            nfp, nf = nf, min(2 ** n, 8)
            seq += [tnn.Conv2d(ndf * nfp, ndf * nf, 4, 2, 1, bias=False),
                    tnn.BatchNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True)]
        nfp, nf = nf, min(2 ** n_layers, 8)
        seq += [tnn.Conv2d(ndf * nfp, ndf * nf, 4, 1, 1, bias=False),
                tnn.BatchNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True)]
        seq += [tnn.Conv2d(ndf * nf, 1, 4, 1, 1)]
        self.main = tnn.Sequential(*seq)

    def forward(self, x):
        return self.main(x)


class TestDiscriminator:
    def test_parity_eval(self):
        tm = TDisc(ndf=8).eval()
        # non-trivial running stats
        with torch.no_grad():
            for _ in range(3):
                tm.train()(torch.randn(4, 3, 32, 32))
            tm.eval()
        variables, unused = P.import_nlayer_discriminator(tm.state_dict())
        assert unused == [], unused
        x = np.random.RandomState(2).randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x)).numpy()
        got = P.NLayerDiscriminator(ndf=8).apply(
            variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_d_losses_match_torch(self):
        lr = np.random.RandomState(0).randn(2, 1, 6, 6).astype(np.float32)
        lf = np.random.RandomState(1).randn(2, 1, 6, 6).astype(np.float32)
        h_ref = 0.5 * (tF.relu(1 - torch.tensor(lr)).mean()
                       + tF.relu(1 + torch.tensor(lf)).mean())
        v_ref = 0.5 * (tF.softplus(-torch.tensor(lr)).mean()
                       + tF.softplus(torch.tensor(lf)).mean())
        np.testing.assert_allclose(
            float(P.hinge_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
            float(h_ref), rtol=1e-6)
        np.testing.assert_allclose(
            float(P.vanilla_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
            float(v_ref), rtol=1e-6)


class TestGeneratorLoss:
    def test_shapes_and_logs(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
        r = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
        lp = lambda a, b: jnp.mean(jnp.abs(a - b), axis=(1, 2, 3),
                                   keepdims=True)
        disc = lambda a: a[:, :1, ::4, ::4]
        loss, log = P.generator_loss(
            x, r, lpips_apply=lp, disc_apply=disc, logvar=jnp.asarray(0.0),
            regularization_log={"kl_loss": jnp.asarray(2.0)},
            regularization_weights={"kl_loss": 0.5})
        assert jnp.isfinite(loss)
        # kl regularization folded in with its weight
        base, _ = P.generator_loss(x, r, lpips_apply=lp, disc_apply=disc,
                                   logvar=jnp.asarray(0.0))
        np.testing.assert_allclose(float(loss - base), 1.0, rtol=1e-5)
        assert "loss/g" in log and "scalars/d_weight" in log

    def test_adaptive_weight_ratio(self):
        g1 = jnp.asarray(np.full((4, 4), 2.0, np.float32))
        g2 = jnp.asarray(np.full((4, 4), 0.5, np.float32))
        w = P.adaptive_weight(g1, g2, disc_weight=3.0)
        np.testing.assert_allclose(float(w), 3.0 * 8.0 / (2.0 + 1e-4 / 4),
                                   rtol=1e-3)

    def test_video_dims_flatten(self):
        x = jnp.zeros((2, 3, 4, 8, 8))
        assert P.flatten_video(x).shape == (8, 3, 8, 8)


# ---------------------------------------------------------------------------
# quantizers (reference regularizers/quantize.py)
# ---------------------------------------------------------------------------

class TestVectorQuantizer:
    def _torch_ref(self, z, codebook, beta):
        zt = torch.tensor(z).permute(0, 2, 3, 1).contiguous()
        zf = zt.reshape(-1, codebook.shape[1])
        e = torch.tensor(codebook)
        d = (zf.pow(2).sum(1, keepdim=True) + e.pow(2).sum(1)
             - 2 * zf @ e.t())
        idx = d.argmin(1)
        z_q = e[idx].view(zt.shape)
        loss = beta * ((z_q - zt) ** 2).mean() + ((z_q - zt) ** 2).mean()
        z_q = zt + (z_q - zt)  # values identical; grads differ
        return z_q.permute(0, 3, 1, 2).numpy(), idx.numpy(), float(loss)

    def test_forward_matches_torch_math(self):
        rng = np.random.RandomState(0)
        z = rng.randn(2, 4, 3, 3).astype(np.float32)
        m = VQ.VectorQuantizer(n_e=11, e_dim=4, beta=0.25,
                               sane_index_shape=True, log_perplexity=True)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
        zq, out = m.apply({"params": params}, jnp.asarray(z))
        ref_zq, ref_idx, ref_loss = self._torch_ref(
            z, np.asarray(params["embedding"]), 0.25)
        np.testing.assert_allclose(np.asarray(zq), ref_zq, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out["min_encoding_indices"]).reshape(-1), ref_idx)
        np.testing.assert_allclose(float(out["loss/vq"]), ref_loss,
                                   rtol=1e-5)
        assert out["min_encoding_indices"].shape == (2, 3, 3)
        assert float(out["perplexity"]) > 0

    def test_straight_through_gradient(self):
        m = VQ.VectorQuantizer(n_e=5, e_dim=3)
        z = jnp.asarray(np.random.RandomState(1).randn(1, 3, 2, 2)
                        .astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), z)["params"]

        def f(zz):
            zq, _ = m.apply({"params": params}, zz)
            return jnp.sum(zq)

        g = jax.grad(f)(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)

    def test_codebook_entry_roundtrip(self):
        m = VQ.VectorQuantizer(n_e=5, e_dim=3)
        z = jnp.asarray(np.random.RandomState(1).randn(2, 3, 2, 2)
                        .astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), z)["params"]
        zq, out = m.apply({"params": params}, z)
        back = m.get_codebook_entry(params, out["min_encoding_indices"]
                                    .reshape(-1), shape=(2, 2, 2, 3))
        np.testing.assert_allclose(np.asarray(back), np.asarray(zq),
                                   atol=1e-6)


class TestEMAVectorQuantizer:
    def test_ema_update_math(self):
        m = VQ.EMAVectorQuantizer(n_embed=6, embedding_dim=4, beta=0.25,
                                  decay=0.9)
        z = jnp.asarray(np.random.RandomState(0).randn(2, 4, 3, 3)
                        .astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), z)
        w0 = np.asarray(variables["ema"]["weight"])
        (zq, out), new_vars = m.apply(variables, z, update=True,
                                      mutable=["ema"])
        # manual EMA
        zf = np.asarray(z).transpose(0, 2, 3, 1).reshape(-1, 4)
        d = ((zf ** 2).sum(1, keepdims=True) + (w0 ** 2).sum(1)
             - 2 * zf @ w0.T)
        idx = d.argmin(1)
        enc = np.eye(6, dtype=np.float32)[idx]
        cs = 0.1 * enc.sum(0)
        ea = 0.9 * w0 + 0.1 * (enc.T @ zf)
        n = cs.sum()
        smoothed = (cs + 1e-5) / (n + 6 * 1e-5) * n
        np.testing.assert_allclose(
            np.asarray(new_vars["ema"]["weight"]), ea / smoothed[:, None],
            rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(out["encoding_indices"]),
                                      idx)

    def test_no_update_in_eval(self):
        m = VQ.EMAVectorQuantizer(n_embed=6, embedding_dim=4, beta=0.25)
        z = jnp.zeros((1, 4, 2, 2))
        variables = m.init(jax.random.PRNGKey(0), z)
        _, new_vars = m.apply(variables, z, update=False, mutable=["ema"])
        np.testing.assert_array_equal(
            np.asarray(new_vars["ema"]["weight"]),
            np.asarray(variables["ema"]["weight"]))


class TestGumbelQuantizer:
    def test_hard_eval_selects_argmax_code(self):
        m = VQ.GumbelQuantizer(num_hiddens=4, embedding_dim=3, n_embed=7)
        z = jnp.asarray(np.random.RandomState(0).randn(2, 4, 3, 3)
                        .astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), z)["params"]
        zq, out = m.apply({"params": params}, z, training=False)
        embed = np.asarray(params["embed"])
        idx = np.asarray(out["indices"])
        expect = embed[idx].transpose(0, 3, 1, 2)
        np.testing.assert_allclose(np.asarray(zq), expect, atol=1e-6)

    def test_kl_zero_for_uniform_logits(self):
        m = VQ.GumbelQuantizer(num_hiddens=4, embedding_dim=3, n_embed=7,
                               kl_weight=1.0)
        z = jnp.zeros((1, 4, 2, 2))
        params = m.init(jax.random.PRNGKey(0), z)["params"]
        params = jax.tree_util.tree_map(jnp.zeros_like, params)
        _, out = m.apply({"params": params}, z, training=False)
        np.testing.assert_allclose(float(out["loss/vq"]), 0.0, atol=1e-5)


class TestRegularizers:
    def test_identity(self):
        z = jnp.ones((2, 3))
        out, log = VQ.identity_regularizer(z)
        assert log == {} and (out == z).all()

    def test_diagonal_gaussian_kl(self):
        # mean 0, logvar 0 -> KL exactly 0
        z = jnp.zeros((2, 8, 4, 4))
        out, log = VQ.diagonal_gaussian_regularizer(z, sample=False)
        np.testing.assert_allclose(float(log["kl_loss"]), 0.0, atol=1e-6)
        assert out.shape == (2, 4, 4, 4)
        # nonzero mean increases KL by 0.5*sum(mean^2)/B
        z2 = z.at[:, :4].set(1.0)
        _, log2 = VQ.diagonal_gaussian_regularizer(z2, sample=False)
        np.testing.assert_allclose(float(log2["kl_loss"]),
                                   0.5 * 4 * 16, rtol=1e-5)

    def test_input_projection_quantizer(self):
        m = VQ.VectorQuantizerWithInputProjection(
            input_dim=6, n_codes=9, codebook_dim=4, output_dim=6)
        z = jnp.asarray(np.random.RandomState(0).randn(2, 6, 3, 3)
                        .astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), z)["params"]
        zq, out = m.apply({"params": params}, z)
        assert zq.shape == z.shape
        assert jnp.isfinite(out["loss/vq"])


class TestRemap:
    def test_remap_and_unmap_roundtrip(self):
        used = jnp.asarray([2, 5, 7])
        inds = jnp.asarray([[2, 5], [7, 2]])
        mapped = VQ.remap_to_used(inds, used, unknown_index=0)
        np.testing.assert_array_equal(np.asarray(mapped), [[0, 1], [2, 0]])
        back = VQ.unmap_to_all(mapped, used)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(inds))

    def test_unknown_fixed_and_random(self):
        used = jnp.asarray([2, 5])
        inds = jnp.asarray([[3, 5]])  # 3 is unknown
        fixed = VQ.remap_to_used(inds, used, unknown_index=1)
        np.testing.assert_array_equal(np.asarray(fixed), [[1, 1]])
        rnd = VQ.remap_to_used(inds, used, unknown_index="random",
                               key=jax.random.PRNGKey(0))
        assert 0 <= int(rnd[0, 0]) < 2
        assert int(rnd[0, 1]) == 1  # known index unaffected

    def test_extra_token_collapses_to_zero(self):
        used = jnp.asarray([4, 9])
        back = VQ.unmap_to_all(jnp.asarray([[0, 1, 2]]), used)
        np.testing.assert_array_equal(np.asarray(back), [[4, 9, 4]])


class TestEMAQuantizerSharded:
    def test_psum_ema_matches_single_device(self):
        """EMAVectorQuantizer with axis_name: batch sharded over the
        8-device mesh must produce the SAME codebook update as one
        device seeing the full batch (the psum-reduced statistics)."""
        import jax
        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        n_dev = len(jax.devices())
        if n_dev < 2:
            pytest.skip("needs multiple devices")
        m_single = VQ.EMAVectorQuantizer(n_embed=6, embedding_dim=4,
                                         beta=0.25, decay=0.9)
        m_shard = VQ.EMAVectorQuantizer(n_embed=6, embedding_dim=4,
                                        beta=0.25, decay=0.9,
                                        axis_name="data")
        z = jnp.asarray(np.random.RandomState(0)
                        .randn(n_dev * 2, 4, 2, 2).astype(np.float32))
        variables = m_single.init(jax.random.PRNGKey(0), z)

        (_, _), ref_vars = m_single.apply(variables, z, update=True,
                                          mutable=["ema"])

        mesh = Mesh(np.array(jax.devices()), ("data",))

        def fn(ema, zz):
            (zq, out), new = m_shard.apply(
                {"ema": ema}, zz, update=True, mutable=["ema"])
            return new["ema"]

        new_ema = shard_map(fn, mesh=mesh,
                            in_specs=(P(), P("data")),
                            out_specs=P())(variables["ema"], z)
        np.testing.assert_allclose(np.asarray(new_ema["weight"]),
                                   np.asarray(ref_vars["ema"]["weight"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_ema["cluster_size"]),
            np.asarray(ref_vars["ema"]["cluster_size"]), rtol=1e-5)
