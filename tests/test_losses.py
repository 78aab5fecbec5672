"""Loss-library unit tests: golden values vs a numpy re-derivation and
parity with the reference's torch semantics (reference utils.py:127-245)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.training import losses


def _np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _np_log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


class TestSoftClip:
    def test_matches_numpy(self, rng):
        preds = np.random.default_rng(0).normal(size=(6, 16)).astype(np.float32)
        targs = np.random.default_rng(1).normal(size=(6, 16)).astype(np.float32)
        preds /= np.linalg.norm(preds, axis=1, keepdims=True)
        targs /= np.linalg.norm(targs, axis=1, keepdims=True)
        temp = 0.125
        cc = targs @ targs.T / temp
        bc = preds @ targs.T / temp
        l1 = -(_np_log_softmax(bc) * _np_softmax(cc)).sum(-1).mean()
        l2 = -(_np_log_softmax(bc.T) * _np_softmax(cc)).sum(-1).mean()
        expected = (l1 + l2) / 2
        got = losses.soft_clip_loss(jnp.asarray(preds), jnp.asarray(targs), temp)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_identity_lower_than_shuffled(self):
        x = np.random.default_rng(2).normal(size=(8, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        same = losses.soft_clip_loss(jnp.asarray(x), jnp.asarray(x))
        perm = losses.soft_clip_loss(jnp.asarray(x[::-1].copy()), jnp.asarray(x))
        assert float(same) < float(perm)


class TestMixco:
    def test_shapes_and_unselected_rows_unchanged(self, rng):
        v = jax.random.normal(rng, (10, 50))
        mixed, st = losses.mixco(jax.random.PRNGKey(3), v)
        assert mixed.shape == v.shape
        unsel = np.asarray(~st.select)
        np.testing.assert_allclose(np.asarray(mixed)[unsel],
                                   np.asarray(v)[unsel], rtol=1e-6)
        # betas forced to 1 on unselected rows (reference utils.py:174)
        np.testing.assert_allclose(np.asarray(st.betas)[unsel], 1.0)

    def test_mixed_rows_are_convex_combos(self):
        v = jax.random.normal(jax.random.PRNGKey(4), (16, 8))
        mixed, st = losses.mixco(jax.random.PRNGKey(5), v)
        sel = np.asarray(st.select)
        vm = np.asarray(v)
        expect = vm * np.asarray(st.betas)[:, None] + \
            vm[np.asarray(st.perm)] * (1 - np.asarray(st.betas))[:, None]
        np.testing.assert_allclose(np.asarray(mixed)[sel], expect[sel], rtol=1e-5)


class TestMixcoNCE:
    def test_plain_nce_matches_cross_entropy(self):
        g = np.random.default_rng(6)
        preds = g.normal(size=(5, 12)).astype(np.float32)
        targs = g.normal(size=(5, 12)).astype(np.float32)
        logits = preds @ targs.T / 0.1
        ce1 = -np.take_along_axis(_np_log_softmax(logits),
                                  np.arange(5)[:, None], 1).mean()
        ce2 = -np.take_along_axis(_np_log_softmax(logits.T),
                                  np.arange(5)[:, None], 1).mean()
        expected = (ce1 + ce2) / 2
        got = losses.mixco_nce(jnp.asarray(preds), jnp.asarray(targs), temp=0.1)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_with_mixup_state(self):
        g = np.random.default_rng(7)
        preds = jnp.asarray(g.normal(size=(6, 8)).astype(np.float32))
        targs = jnp.asarray(g.normal(size=(6, 8)).astype(np.float32))
        _, st = losses.mixco(jax.random.PRNGKey(8), preds)
        loss = losses.mixco_nce(preds, targs, temp=0.1, state=st)
        assert np.isfinite(float(loss))


class TestDice:
    def test_perfect_prediction_near_zero(self):
        mask = jnp.ones((2, 1, 8, 8))
        logits = jnp.full((2, 1, 8, 8), 20.0)  # sigmoid ~ 1
        assert float(losses.dice_loss(logits, mask)) < 1e-3

    def test_wrong_prediction_near_one(self):
        mask = jnp.zeros((2, 1, 8, 8))
        logits = jnp.full((2, 1, 8, 8), 20.0)
        assert float(losses.dice_loss(logits, mask)) > 0.99


class TestCrossEntropyIgnore:
    def test_ignores_padding(self):
        logits = jnp.asarray(np.random.default_rng(9).normal(size=(4, 10))
                             .astype(np.float32))
        labels_pad = jnp.asarray([3, 0, 0, 0])
        labels_full = jnp.asarray([3, 3, 3, 3])
        l_pad = losses.cross_entropy_ignore(logits, labels_pad,
                                            label_smoothing=0.0)
        # only the first row should contribute
        l_row0 = losses.cross_entropy_ignore(logits[:1], labels_full[:1],
                                             label_smoothing=0.0)
        np.testing.assert_allclose(l_pad, l_row0, rtol=1e-5)


class TestRetrieval:
    def test_topk_perfect(self):
        sim = jnp.eye(10)
        labels = jnp.arange(10)
        assert float(losses.topk_accuracy(sim, labels, k=1)) == 1.0

    def test_batchwise_cosine_is_transposed(self):
        g = np.random.default_rng(10)
        z = g.normal(size=(4, 6)).astype(np.float32)
        b = g.normal(size=(4, 6)).astype(np.float32)
        got = np.asarray(losses.batchwise_cosine_similarity(
            jnp.asarray(z), jnp.asarray(b)))
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        np.testing.assert_allclose(got, (zn @ bn.T).T, rtol=1e-5)


class TestCosineAnneal:
    def test_endpoints(self):
        s = losses.cosine_anneal(0.004, 0.0075, 100)
        np.testing.assert_allclose(s[0], 0.004, rtol=1e-5)
        np.testing.assert_allclose(s[-1], 0.0075, rtol=1e-5)


class TestCurriculum:
    def test_weights_ramp(self):
        from neurons_tpu.training.curriculum import get_loss_weights
        total_epochs, bpe = 50, 100
        w0 = get_loss_weights(total_epochs, 0, 0, bpe)
        np.testing.assert_allclose(w0[0], 1.0, atol=1e-6)  # sin(0)=0
        # all tasks outside their window -> weight exactly 1
        w_end = get_loss_weights(total_epochs, 49, 99, bpe)
        assert np.asarray(w_end).shape == (4,)
        # mid-window weight for task 0: epoch = period/2 = 10 -> sin(pi/2)=1 -> 10
        w_mid = get_loss_weights(total_epochs, 10, 0, bpe)
        np.testing.assert_allclose(w_mid[0], 10.0, atol=1e-4)
