"""Fused temporal-attention kernel vs the einsum reference.

The kernel computes per-pixel cross-frame attention in the folded
[(B F), D, C] layout with lane-packed logits (F*H == 128); these tests
run it in interpret mode on CPU against temporal_attention_reference
and against a straightforward per-head loop oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.ops.temporal_attention import (
    _kernel_eligible, _pick_dblk, _temporal_attention_impl,
    temporal_attention, temporal_attention_reference)


def _qkv(seed, bf, d, c, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [jax.random.normal(k, (bf, d, c), dtype) for k in ks]


def _oracle(q, k, v, f, h, scale):
    """Per-(pixel, head) loop oracle — independent of both paths."""
    bf, d, c = q.shape
    b = bf // f
    hd = c // h
    out = np.zeros((bf, d, c), np.float32)
    qn, kn, vn = (np.asarray(x, np.float32) for x in (q, k, v))
    for bi in range(b):
        for di in range(d):
            for hi in range(h):
                sl = slice(hi * hd, (hi + 1) * hd)
                qs = qn[bi * f:(bi + 1) * f, di, sl]       # [f, hd]
                ks_ = kn[bi * f:(bi + 1) * f, di, sl]
                vs = vn[bi * f:(bi + 1) * f, di, sl]
                logits = qs @ ks_.T * scale
                w = np.exp(logits - logits.max(-1, keepdims=True))
                w /= w.sum(-1, keepdims=True)
                out[bi * f:(bi + 1) * f, di, sl] = w @ vs
    return out


class TestTemporalAttention:
    def test_reference_matches_oracle(self):
        f, h, d, c = 4, 2, 6, 8
        q, k, v = _qkv(0, 2 * f, d, c)
        got = temporal_attention_reference(q, k, v, f, h, 0.5)
        np.testing.assert_allclose(np.asarray(got), _oracle(q, k, v, f, h, 0.5),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("c,d", [(320, 64), (640, 32), (1280, 16)])
    def test_kernel_matches_reference(self, c, d):
        """Production motion-module shapes: F=16, H=8 (F*H = 128)."""
        f, h = 16, 8
        q, k, v = _qkv(1, 2 * f, d, c)
        scale = (c // h) ** -0.5
        got = _temporal_attention_impl(q, k, v, f, h, scale, True)
        want = temporal_attention_reference(q, k, v, f, h, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_kernel_bf16_compensated(self):
        # hi+lo compensated products (NEURONS_TPU_TA_COMPENSATED): the
        # kernel must match the exact bf16-product/f32-accumulate einsum
        # reference tightly, not just to within bf16 cancellation drift
        f, h, d, c = 16, 8, 32, 320
        q, k, v = _qkv(2, f, d, c, jnp.bfloat16)
        scale = 40 ** -0.5
        got = np.asarray(
            _temporal_attention_impl(q, k, v, f, h, scale, True,
                                     compensate=True), np.float32)
        want = np.asarray(
            temporal_attention_reference(q, k, v, f, h, scale), np.float32)
        assert np.abs(got - want).max() < 5e-3

    def test_kernel_bf16_default_noise_floor(self):
        """The default (uncompensated) bf16 kernel must sit at the SAME
        noise floor vs a float64 oracle as the bf16 einsum reference
        itself — product rounding is decorrelated noise, not added
        error (the basis for shipping it on the exact path)."""
        f, h, d, c = 16, 8, 32, 320
        q, k, v = _qkv(2, f, d, c, jnp.bfloat16)
        scale = 40 ** -0.5
        # float64 oracle in numpy (jax_enable_x64 is off in the suite)
        qn, kn, vn = (np.asarray(x, np.float64) for x in (q, k, v))

        def split64(y):
            return y.reshape(1, f, d, h, c // h)

        lg = np.einsum("bidhk,bjdhk->bdhij", split64(qn),
                       split64(kn)) * scale
        w = np.exp(lg - lg.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        o64 = np.einsum("bdhij,bjdhk->bidhk", w,
                        split64(vn)).reshape(f, d, c)
        ref = np.asarray(temporal_attention_reference(q, k, v, f, h,
                                                      scale), np.float64)
        got = np.asarray(_temporal_attention_impl(
            q, k, v, f, h, scale, True, compensate=False), np.float64)

        def rms(a):
            return np.sqrt(np.mean((a - o64) ** 2) / np.mean(o64 ** 2))

        assert rms(got) < 1.5 * rms(ref), (rms(got), rms(ref))

    def test_interpret_ineligible_falls_back(self):
        # non-power-of-2 n_frames breaks the lane-roll tree; interpret
        # mode must take the reference path, not emulate a wrong kernel
        f, h, d, c = 12, 8, 8, 64
        q, k, v = _qkv(7, 2 * f, d, c)
        got = _temporal_attention_impl(q, k, v, f, h, 0.3, True)
        want = temporal_attention_reference(q, k, v, f, h, 0.3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_grad_through_interpret_kernel(self):
        # eligible shape + interpret=True: forward takes the emulated
        # kernel, backward the reference VJP — the production custom_vjp
        # combination, which the ineligible-shape grad test never hits
        f, h, d, c = 16, 8, 8, 64
        q, k, v = _qkv(8, f, d, c)
        wgt = jax.random.normal(jax.random.PRNGKey(11), (f, d, c))
        scale = (c // h) ** -0.5

        def loss_pub(q, k, v):
            return jnp.sum(
                temporal_attention(q, k, v, f, h, scale, True) * wgt)

        def loss_ref(q, k, v):
            return jnp.sum(
                temporal_attention_reference(q, k, v, f, h, scale) * wgt)

        # forward really is the kernel (not a silent fallback)
        np.testing.assert_allclose(
            np.asarray(temporal_attention(q, k, v, f, h, scale, True)),
            np.asarray(temporal_attention_reference(q, k, v, f, h, scale)),
            rtol=2e-5, atol=2e-5)
        g1 = jax.grad(loss_pub, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    def test_kernel_multi_d_blocks(self):
        # d spans several dblk-sized grid steps
        f, h, c = 16, 8, 320
        d = _pick_dblk(1024, c) * 3
        q, k, v = _qkv(3, f, d, c)
        got = _temporal_attention_impl(q, k, v, f, h, 0.1, True)
        want = temporal_attention_reference(q, k, v, f, h, 0.1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_matches_reference(self):
        f, h, d, c = 4, 2, 6, 8
        q, k, v = _qkv(4, 2 * f, d, c)
        wgt = jax.random.normal(jax.random.PRNGKey(9), (2 * f, d, c))

        def loss_pub(q, k, v):
            return jnp.sum(temporal_attention(q, k, v, f, h, 0.5) * wgt)

        def loss_ref(q, k, v):
            return jnp.sum(
                temporal_attention_reference(q, k, v, f, h, 0.5) * wgt)

        g1 = jax.grad(loss_pub, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_eligibility_gate(self):
        # F*H != 128 or misaligned heads must not claim the kernel
        assert _kernel_eligible(32, 64, 320, 16, 8, jnp.bfloat16)
        assert not _kernel_eligible(32, 64, 320, 8, 8, jnp.bfloat16)
        assert not _kernel_eligible(32, 64, 320, 16, 10, jnp.bfloat16)
        assert not _kernel_eligible(33, 64, 320, 16, 8, jnp.bfloat16)
        assert not _kernel_eligible(32, 64, 324, 16, 8, jnp.bfloat16)
