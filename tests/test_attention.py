"""Pallas flash attention: interpret-mode parity vs the XLA reference
across self/cross/padded shapes, plus dispatch behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.ops.attention import (dot_product_attention,
                                       flash_attention, xla_attention)


def _qkv(rng, b, h, tq, tk, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(rng, 3)
    return (jax.random.normal(kq, (b, h, tq, d), dtype),
            jax.random.normal(kk, (b, h, tk, d), dtype),
            jax.random.normal(kv, (b, h, tk, d), dtype))


class TestFlashAttention:
    @pytest.mark.parametrize("tq,tk,d", [
        (256, 256, 64),    # tile-aligned self
        (256, 77, 64),     # cross with padded kv
        (150, 300, 52),    # nothing aligned (prior head dim 52)
        (513, 513, 52),    # the prior's sequence
        (576, 576, 64),    # unCLIP mid-stage (divisor block 192, no pad)
        (576, 256, 64),    # unCLIP mid cross-attn
        (2304, 2304, 64),  # unCLIP ds2 self-attn (block 256 divides)
        (1024, 1024, 80),  # video UNet spatial (unpadded d=80)
        (1024, 1024, 40),  # video UNet level-0 spatial (d=40)
    ])
    def test_matches_xla(self, rng, tq, tk, d):
        q, k, v = _qkv(rng, 2, 3, tq, tk, d)
        ref = xla_attention(q, k, v)
        got = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_custom_scale(self, rng):
        q, k, v = _qkv(rng, 1, 2, 130, 140, 32)
        ref = xla_attention(q, k, v, scale=0.07)
        got = flash_attention(q, k, v, scale=0.07, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_tolerance(self, rng):
        q, k, v = _qkv(rng, 1, 2, 256, 256, 64, jnp.bfloat16)
        ref = np.asarray(xla_attention(q, k, v), np.float32)
        got = np.asarray(flash_attention(q, k, v, interpret=True),
                         np.float32)
        assert np.abs(got - ref).max() < 0.05

    @pytest.mark.parametrize("bias_shape", ["hqk", "bhqk", "qk"])
    def test_bias_matches_xla(self, rng, bias_shape, monkeypatch):
        """Bias-capable whole-KV kernel (the prior's RelPosBias path,
        513 q tokens x 514 kv incl. the learned null token, d=52).
        The primal routes biased shapes to XLA unless
        NEURONS_TPU_BIAS_FLASH=1 — set it so the kernel is exercised."""
        monkeypatch.setenv("NEURONS_TPU_BIAS_FLASH", "1")
        b, h, tq, tk, d = 2, 4, 513, 514, 52
        q, k, v = _qkv(rng, b, h, tq, tk, d)
        shape = {"hqk": (h, tq, tk), "bhqk": (b, h, tq, tk),
                 "qk": (tq, tk)}[bias_shape]
        bias = jax.random.normal(jax.random.PRNGKey(9), shape)
        got = flash_attention(q, k, v, bias=bias, interpret=True)
        want = xla_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("b,h,tq,tk,d", [
        (1, 2, 130, 140, 16),
        # tq > 512 exercises the q padding path in the Pallas backward
        # (the prior's 513-token shape pads rows)
        (1, 1, 513, 140, 8),
    ])
    def test_bias_grads_match_xla(self, b, h, tq, tk, d):
        """Routes through the lse-emitting bias forward + the Pallas
        bias backward (dbias per-head, summed over batch)."""
        q, k, v = _qkv(jax.random.PRNGKey(3), b, h, tq, tk, d)
        bias = jax.random.normal(jax.random.PRNGKey(4), (h, tq, tk))
        w = jax.random.normal(jax.random.PRNGKey(5), (b, h, tq, d))

        def loss_flash(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias=bias,
                                           interpret=True) * w)

        def loss_xla(q, k, v, bias):
            return jnp.sum(xla_attention(q, k, v, bias=bias) * w)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4)

    @pytest.mark.parametrize("bias_shape", ["qk", "bhqk", "hqk"])
    def test_bias_grad_reductions(self, bias_shape):
        """dbias reduction semantics across the three bias ranks with
        b > 1 AND h > 1: [Tq,Tk] sums over b*h replicas, [h,Tq,Tk] sums
        over b, [b,h,Tq,Tk] sums over nothing — the Pallas bias backward
        accumulates each across its replica grid axis."""
        b, h, tq, tk, d = 3, 2, 160, 140, 16
        q, k, v = _qkv(jax.random.PRNGKey(7), b, h, tq, tk, d)
        shape = {"hqk": (h, tq, tk), "bhqk": (b, h, tq, tk),
                 "qk": (tq, tk)}[bias_shape]
        bias = jax.random.normal(jax.random.PRNGKey(8), shape)
        w = jax.random.normal(jax.random.PRNGKey(9), (b, h, tq, d))

        g1 = jax.grad(lambda bias: jnp.sum(flash_attention(
            q, k, v, bias=bias, interpret=True) * w))(bias)
        g2 = jax.grad(lambda bias: jnp.sum(xla_attention(
            q, k, v, bias=bias) * w))(bias)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=2e-4, rtol=2e-4)

    def test_dispatch_uses_xla_for_bias_and_small(self, rng):
        # tiny sequences must route to XLA; biased attention routes to the
        # whole-KV kernel only on TPU with >=128-token rows (correctness
        # guaranteed either way; this documents the dispatch contract)
        q, k, v = _qkv(rng, 1, 2, 16, 16, 8)
        bias = jnp.zeros((1, 2, 16, 16))
        out = dot_product_attention(q, k, v, bias=bias)
        ref = xla_attention(q, k, v, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


class TestStreamingPath:
    def test_long_kv_routes_to_streaming_and_matches(self, rng):
        # 9216 tokens @ 512 dims exceeds the whole-KV VMEM budget -> the
        # streaming grid kernel (the VAE mid-attention forcing case)
        q, k, v = _qkv(rng, 1, 1, 256, 9216, 512)
        ref = xla_attention(q, k, v)
        got = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-5, atol=5e-5)


class TestFlashAttentionGrad:
    def test_custom_vjp_matches_xla_grad(self):
        """pallas_call has no autodiff rule; the custom VJP recomputes the
        backward through the XLA path — gradients must match xla_attention
        exactly. Runs the kernel in interpret mode (CPU)."""
        from neurons_tpu.ops.attention import flash_attention, xla_attention

        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(1, 2, 160, 16).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 2, 192, 16).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 2, 192, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(1, 2, 160, 16).astype(np.float32))

        def f_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, interpret=True) * w)

        def f_xla(q, k, v):
            return jnp.sum(xla_attention(q, k, v) * w)

        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_streaming_lse_backward(self):
        """f32 kv rows > the whole-KV cap route the VJP forward through
        the STREAMING kernel's lse output; the Pallas backward must
        still match XLA (decoder-style small d=32)."""
        rng = np.random.RandomState(7)
        q = jnp.asarray(rng.randn(1, 1, 1280, 32).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 1, 1280, 32).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 1, 1280, 32).astype(np.float32))
        w = jnp.asarray(rng.randn(1, 1, 1280, 32).astype(np.float32))

        g_flash = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, interpret=True) * w),
            argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(lambda q, k, v: jnp.sum(
            xla_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-4)

    def test_bf16_backward(self):
        """bf16 operands (the autocast training path): the Pallas
        backward's f32 accumulation must stay at the bf16 noise floor
        vs an f32 XLA reference."""
        rng = np.random.RandomState(11)
        qf = rng.randn(2, 1, 256, 32).astype(np.float32)
        kf = rng.randn(2, 1, 256, 32).astype(np.float32)
        vf = rng.randn(2, 1, 256, 32).astype(np.float32)
        wf = rng.randn(2, 1, 256, 32).astype(np.float32)
        qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (qf, kf, vf))
        w = jnp.asarray(wf, jnp.bfloat16)

        g_flash = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, interpret=True).astype(jnp.float32)
            * w.astype(jnp.float32)), argnums=(0, 1, 2))(qb, kb, vb)
        g_xla = jax.grad(lambda q, k, v: jnp.sum(
            xla_attention(q, k, v) * wf), argnums=(0, 1, 2))(
                *(jnp.asarray(x) for x in (qf, kf, vf)))
        for a, b in zip(g_flash, g_xla):
            err = np.abs(np.asarray(a, np.float32) - np.asarray(b))
            assert err.max() < 0.15, err.max()

    def test_env_knob_falls_back_to_chunked(self, monkeypatch):
        """NEURONS_TPU_PALLAS_BWD=0 must take the q-chunked XLA backward
        (no lse saved) and still match."""
        monkeypatch.setenv("NEURONS_TPU_PALLAS_BWD", "0")
        rng = np.random.RandomState(13)
        q = jnp.asarray(rng.randn(1, 2, 160, 16).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 2, 192, 16).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 2, 192, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(1, 2, 160, 16).astype(np.float32))

        g_flash = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, interpret=True) * w),
            argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(lambda q, k, v: jnp.sum(
            xla_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_vmem_ineligible_shape_falls_back(self):
        """9216 q rows x d=512 f32: the persistent dq accumulator alone
        (~19 MB) exceeds the bwd VMEM budget at any block size —
        _flash_bwd_pallas returns None and the caller takes the
        q-chunked XLA backward (whose correctness is pinned by
        test_env_knob_falls_back_to_chunked)."""
        from neurons_tpu.ops import attention as A
        z = jnp.zeros((1, 1, 9216, 512), jnp.float32)
        zk = jnp.zeros((1, 1, 256, 512), jnp.float32)
        assert A._flash_bwd_pallas(z, zk, zk, z, z,
                                   jnp.zeros((1, 1, 9216)),
                                   512 ** -0.5, True) is None

    def test_chunked_backward_multichunk_padding(self):
        """Tq=600 > chunk 512: two chunks with 424 zero-padded rows —
        gradients must still match the dense XLA backward."""
        from neurons_tpu.ops.attention import flash_attention, xla_attention

        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(1, 1, 600, 16).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 1, 256, 16).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 1, 256, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(1, 1, 600, 16).astype(np.float32))

        g_flash = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, interpret=True) * w),
            argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(lambda q, k, v: jnp.sum(
            xla_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-5)


class TestMultiQuery:
    """Multi-query k/v [B, 1, Tk, D] shared across q's H heads (the
    prior's layout): kernels read the shared kv row via the index map;
    dk/dv return head-summed at the kv shape."""

    def _mq(self, key, b, h, tq, tk, d):
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, h, tq, d))
        k = jax.random.normal(ks[1], (b, 1, tk, d))
        v = jax.random.normal(ks[2], (b, 1, tk, d))
        return q, k, v

    def _dense(self, q, k, v):
        kb = jnp.broadcast_to(k, q.shape[:2] + k.shape[2:])
        vb = jnp.broadcast_to(v, q.shape[:2] + v.shape[2:])
        return kb, vb

    def test_fwd_matches_dense_wholekv(self):
        q, k, v = self._mq(jax.random.PRNGKey(0), 2, 4, 200, 180, 16)
        got = flash_attention(q, k, v, interpret=True)
        kb, vb = self._dense(q, k, v)
        want = xla_attention(q, kb, vb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_fwd_matches_dense_streaming(self):
        # long kv -> streaming grid; mq index map on the block axis
        q, k, v = self._mq(jax.random.PRNGKey(1), 1, 3, 256, 3000, 16)
        got = flash_attention(q, k, v, interpret=True)
        kb, vb = self._dense(q, k, v)
        want = xla_attention(q, kb, vb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_fwd_bias_matches_dense(self, monkeypatch):
        monkeypatch.setenv("NEURONS_TPU_BIAS_FLASH", "1")
        b, h, tq, tk, d = 2, 4, 513, 514, 52  # the prior's shape
        q, k, v = self._mq(jax.random.PRNGKey(2), b, h, tq, tk, d)
        bias = jax.random.normal(jax.random.PRNGKey(3), (h, tq, tk))
        got = flash_attention(q, k, v, bias=bias, interpret=True)
        kb, vb = self._dense(q, k, v)
        want = xla_attention(q, kb, vb, bias=bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("bias_shape", ["qk", "hqk", "bhqk"])
    def test_bias_grads_match_dense(self, bias_shape):
        """The MQ Pallas bias backward: dk/dv head-summed at [B,1,Tk,D],
        dbias reductions across all three ranks."""
        b, h, tq, tk, d = 2, 3, 160, 140, 16
        q, k, v = self._mq(jax.random.PRNGKey(4), b, h, tq, tk, d)
        shape = {"hqk": (h, tq, tk), "bhqk": (b, h, tq, tk),
                 "qk": (tq, tk)}[bias_shape]
        bias = jax.random.normal(jax.random.PRNGKey(5), shape)
        w = jax.random.normal(jax.random.PRNGKey(6), (b, h, tq, d))

        def loss_mq(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias=bias,
                                           interpret=True) * w)

        def loss_dense(q, k, v, bias):
            kb, vb = self._dense(q, k, v)
            return jnp.sum(xla_attention(q, kb, vb, bias=bias) * w)

        g1 = jax.grad(loss_mq, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
        assert g1[1].shape == k.shape and g1[2].shape == v.shape
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4)

    def test_unbiased_grads_match_dense(self):
        """MQ through the unbiased Pallas backward (dense fallback path
        with the head-sum reduction)."""
        b, h, tq, tk, d = 1, 4, 130, 140, 16
        q, k, v = self._mq(jax.random.PRNGKey(7), b, h, tq, tk, d)
        w = jax.random.normal(jax.random.PRNGKey(8), (b, h, tq, d))

        def loss_mq(q, k, v):
            return jnp.sum(flash_attention(q, k, v, interpret=True) * w)

        def loss_dense(q, k, v):
            kb, vb = self._dense(q, k, v)
            return jnp.sum(xla_attention(q, kb, vb) * w)

        g1 = jax.grad(loss_mq, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        assert g1[1].shape == k.shape
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4)

    def test_chunked_fallback_grads(self, monkeypatch):
        """MQ through the q-chunked XLA backward (PALLAS_BWD=0)."""
        monkeypatch.setenv("NEURONS_TPU_PALLAS_BWD", "0")
        b, h, tq, tk, d = 1, 2, 130, 140, 16
        q, k, v = self._mq(jax.random.PRNGKey(9), b, h, tq, tk, d)
        bias = jax.random.normal(jax.random.PRNGKey(10), (h, tq, tk))
        w = jax.random.normal(jax.random.PRNGKey(11), (b, h, tq, d))

        def loss_mq(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias=bias,
                                           interpret=True) * w)

        def loss_dense(q, k, v, bias):
            kb, vb = self._dense(q, k, v)
            return jnp.sum(xla_attention(q, kb, vb, bias=bias) * w)

        g1 = jax.grad(loss_mq, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
        assert g1[1].shape == k.shape
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4)
