"""Attention ops: Pallas TPU flash attention + XLA reference path.

TPU-native replacement for the reference's third-party attention kernels —
xformers `memory_efficient_attention` (reference sgm/modules/attention.py:
417-439, animatediff/models/motion_module.py:310-318) and torch SDPA
(sgm/modules/attention.py:332-336). One entry point serves every attention
site in the framework:

  * UNet2D/UNet3D spatial self-attention  (up to ~9216 tokens @ 96x96 latents)
  * cross-attention over CLIP context     (256 x 1664-d tokens, 77 text tokens)
  * motion-module temporal attention      ((b*h*w) batch of 6-16 frame rows)
  * diffusion-prior transformer           (513 tokens, with relative-pos bias)

The Pallas kernel is an online-softmax (flash) attention over k-blocks with
fp32 accumulation, designed for the MXU: q/k/v tiles are (block, 128)-aligned
and the two matmuls per k-block run at bf16 x bf16 -> fp32. Shapes are padded
to tile boundaries in the wrapper; masking of padded kv positions happens
in-kernel against the *static* true length (shapes are static under jit, so
no dynamic control flow is needed).

Attention with an additive bias (the prior's RelPosBias) and the tiny
temporal rows fall through to the XLA path, where the fused softmax is
already optimal at those sizes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/GPU-only; import lazily so CPU tests can run the fallback.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_NEG_INF = -1e30
# Scoped-VMEM budget for block growth: real use runs ~1.9x the estimates
# below against the 16 MB cap (double-buffered tiles + exp intermediates),
# so 8 MB keeps tuned configs inside hardware VMEM. See the calibration
# notes at the _flash_attention_impl block-growth site.
_BUDGET = 8 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        # honor `with jax.default_device(...)` overrides (e.g. CPU-side
        # parameter init in bench.py) before the global backend
        dev = jax.config.jax_default_device
        if dev is not None:
            return getattr(dev, "platform", str(dev)) == "tpu"
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  bias: Optional[jax.Array] = None,
                  mask: Optional[jax.Array] = None,
                  scale: Optional[float] = None) -> jax.Array:
    """Reference attention: softmax(q k^T * scale + bias) v, fp32 softmax.

    q: [..., Tq, D], k/v: [..., Tk, D]; bias/mask broadcastable to
    [..., Tq, Tk]. Multi-query: k/v may carry 1 where q carries H on the
    head axis (rank 4) — the broadcast is explicit here, and XLA fuses
    it into the einsums (no materialization).
    """
    if (q.ndim == 4 and k.ndim == 4 and k.shape[1] == 1
            and q.shape[1] != 1):
        k = jnp.broadcast_to(k, q.shape[:2] + k.shape[2:])
        v = jnp.broadcast_to(v, q.shape[:2] + v.shape[2:])
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_PROBE_CACHE: dict = {}


def _probe_ok(cfg_key, call_fn, args) -> bool:
    """Compile-probe a pallas_call configuration (opt-in via
    NEURONS_TPU_VMEM_PROBE=1): the static VMEM budget below is a
    calibrated estimate of Mosaic's scoped-VMEM use; the probe replaces
    trust in that calibration with an actual compile, falling back to the
    (always VMEM-safe) streaming kernel when Mosaic rejects the config.
    One extra compile per unique shape, amortized by the persistent
    compile cache and memoized per process."""
    if cfg_key in _PROBE_CACHE:
        return _PROBE_CACHE[cfg_key]
    try:
        jax.jit(call_fn).lower(
            *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
        ).compile()
        ok = True
    except Exception:
        ok = False
    _PROBE_CACHE[cfg_key] = ok
    return ok


def _pick_block(t: int, cap: int) -> int:
    """Largest divisor of `t` that is <= cap, a multiple of 16 (bf16
    sublane tile) and >= 128 — a divisor block means ZERO padding, and the
    128 floor keeps awkward lengths (e.g. 4624 = 2^4*17^2, whose only
    small divisors are 16s) on the padded scheme instead of a degenerate
    launch-bound 16-row grid. Falls back to padding when no such divisor
    exists.

    Motivation (profiled on v5e): the unCLIP mid-stage attends over
    576 tokens; rounding 576 up to 2x256 blocks padded q AND kv to 768,
    inflating the attention matmuls by 78%. 576 = 2x288 runs unpadded."""
    if t % 16 == 0:
        for b in range(min(cap, t), 127, -16):
            if t % b == 0:
                return b
    return min(cap, _round_up(t, 128))


def _flash_kernel_smallkv(q_ref, k_ref, v_ref, o_ref, *lse_ref, scale: float,
                          kv_len: int, block_k: int):
    """Whole-KV variant: K/V resident in VMEM, online softmax in
    registers via fori_loop — faster than the streaming grid when the
    padded KV fits the VMEM budget (the UNet's 576-2304-token attention).

    When a trailing `lse_ref` output is passed (training/VJP forward),
    the per-row log-sum-exp of the scaled logits is written for the
    Pallas backward kernel's softmax recompute."""
    # matmul operands stay in the input dtype (bf16 from the UNets): the
    # MXU multiplies bf16 x bf16 with exact f32 accumulation natively, so
    # upcasting q/k/v to f32 only downgraded the matmuls to the 1/4-rate
    # f32 path (profiled: ~2x whole-kernel cost at stage-5 shapes). The
    # softmax state stays f32; `scale` is applied to the f32 logits.
    q = q_ref[...]                                      # [Bq, D]
    bq, d = q.shape
    tk = k_ref.shape[0]
    num_kb = tk // block_k

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)

    def body(i, carry):
        acc, m, l = carry
        kb = k_ref[pl.ds(i * block_k, block_k), :]
        vb = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if lse_ref:
        # padded q rows have l == 0 -> lse = -inf; the backward kernel
        # masks those rows explicitly
        lse_ref[0][...] = m + jnp.log(jnp.maximum(l, 1e-30))


def _flash_kernel_smallkv_bias(q_ref, k_ref, v_ref, b_ref, o_ref,
                               *lse_ref, scale: float, kv_len: int,
                               block_k: int):
    """Whole-KV variant with an additive attention bias (the diffusion
    prior's RelPosBias, reference BrainModel_neurons.py:636-686 via
    dalle2 RelPosBias). The bias tile [block_q, Tk_p] is VMEM-resident
    like K/V; everything else matches `_flash_kernel_smallkv`, including
    the optional log-sum-exp output for the Pallas backward."""
    q = q_ref[...]                                      # [Bq, D]
    bq, d = q.shape
    tk = k_ref.shape[0]
    num_kb = tk // block_k

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)

    def body(i, carry):
        acc, m, l = carry
        kb = k_ref[pl.ds(i * block_k, block_k), :]
        vb = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + b_ref[:, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if lse_ref:
        lse_ref[0][...] = m + jnp.log(jnp.maximum(l, 1e-30))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                  scale: float, kv_len: int, block_k: int, num_kb: int):
    """Streaming flash attention: grid (bh, q_blocks, kv_blocks); the kv
    axis iterates SEQUENTIALLY with the online-softmax state held in VMEM
    scratch, so only one [block_k, D] K/V tile is resident at a time —
    kv length never bounds VMEM (the 9216-token VAE mid-attention was the
    forcing case)."""
    if len(rest) == 4:            # (lse output, then VMEM scratch)
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        lse_ref = None
        acc_ref, m_ref, l_ref = rest
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # bf16 matmul operands + f32 accumulation (see _flash_kernel_smallkv)
    q = q_ref[...]                                      # [Bq, D]
    kb = k_ref[...]                                     # [Bk, D]
    vb = v_ref[...]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev, l_prev, acc_prev = m_ref[...], l_ref[...], acc_ref[...]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_new = acc_prev * alpha + jax.lax.dot_general(
        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = m_new
    l_ref[...] = l_new
    acc_ref[...] = acc_new

    @pl.when(ki == num_kb - 1)
    def _final():
        o_ref[...] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
                      ).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[...] = (m_ref[...]
                            + jnp.log(jnp.maximum(l_ref[...], 1e-30)))


def _flash_bwd_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dq_acc_ref, dk_acc_ref,
                      dv_acc_ref, *, scale: float, q_len: int, kv_len: int,
                      block_q: int, block_k: int, num_kb: int,
                      num_qb: int):
    """Flash-attention backward (FlashAttention-2 style recompute).

    Grid (b*h, kv_blocks, q_blocks) — q innermost so every operand is
    tile-blocked (a whole-q resident design measured 16.75 MB scoped
    VMEM at [60, 4096, 32]: d=32 rows lane-pad to 128 in VMEM, so
    [Tq, 1] lse/delta cost 2 MB each and whole-q q/g/dq 1 MB each).
    The softmax rows are recomputed from the forward's saved
    log-sum-exp, so the [Tq, Tk] probability/ds matrices only ever
    exist tile-sized in VMEM — the q-chunked XLA backward this replaces
    materialized them chunk-sized in HBM (profiled 60 ms of ~0.3 TF/s
    loop fusions per stage-2 step on top of 12 TF/s matmuls).
    dk/dv accumulate in scratch across q tiles (flushed per kv block);
    dq accumulates in a persistent whole-q scratch across kv blocks
    (flushed at the last one). 5 matmuls total — the flash-backward
    optimum."""
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    # no dq_acc zero-init: at ki == 0 each qi slice is OVERWRITTEN below
    # (a whole-array zero at ki == 0 would wipe earlier qi slices, since
    # the init hook runs once per (ki=0, qi) program)

    @pl.when(qi == 0)
    def _init_dkdv():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    kb = k_ref[...]                                     # [Bk, D]
    vb = v_ref[...]
    qs = q_ref[...]                                     # [Bq, D]
    gs = g_ref[...]
    lse = lse_ref[...]                                  # [Bq, 1] f32
    dlt = delta_ref[...]

    s = jax.lax.dot_general(qs, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < kv_len, s, _NEG_INF)
    # padded q rows carry lse = -inf; exp(s - lse) would blow up, so
    # mask them to zero rows (their g rows are zero-padded anyway)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
    p = jnp.where(row < q_len, jnp.exp(s - lse), 0.0)
    pv = p.astype(vb.dtype)
    dv_acc_ref[...] += jax.lax.dot_general(
        pv, gs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gs, vb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - dlt) * scale).astype(kb.dtype)
    dk_acc_ref[...] += jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_upd = jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    sl = pl.ds(qi * block_q, block_q)
    dq_acc_ref[sl, :] = jnp.where(
        ki == 0, dq_upd, dq_acc_ref[sl, :] + dq_upd)

    @pl.when(qi == num_qb - 1)
    def _flush_dkdv():
        dk_ref[...] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc_ref[...].astype(dv_ref.dtype)

    @pl.when(ki == num_kb - 1)
    def _flush_dq():
        dq_ref[...] = dq_acc_ref[pl.ds(qi * block_q, block_q),
                                 :].astype(dq_ref.dtype)


def _flash_bwd_pallas(q, k, v, g, out, lse, scale, interpret):
    """Dispatch wrapper for `_flash_bwd_kernel`. Returns (dq, dk, dv) or
    None when the whole-q residency would not fit the VMEM budget (the
    caller then takes the q-chunked XLA backward)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bh = b * h
    d_p = d if d % 8 == 0 else _round_up(d, 8)
    esize = jnp.dtype(q.dtype).itemsize

    block_q = _pick_block(tq, 512)
    block_k = _pick_block(tk, 512)

    # VMEM rows lane-pad to 128 regardless of d (T(8,128) tiling), so
    # estimate with the padded width
    d_v = max(d_p, 128)

    def _est(bq, bk):
        """Everything is tile-blocked under the 3-D grid; the big
        block-independent term is the persistent whole-q dq accumulator
        (lane-padded f32). s/p/dp/ds live as f32 [bq, bk] tiles
        simultaneously plus bf16 casts; blocked inputs double-buffer."""
        tq_p = _round_up(tq, bq)
        return (tq_p * d_v * 4                    # dq f32 accumulator
                + 2 * bq * d_v * (3 * esize)      # q, g, dq out (dbl-buf)
                + 8 * bk * d_v * esize            # k/v + dk/dv (dbl-buf)
                + 2 * bk * d_v * 4                # dk/dv f32 scratch
                + 5 * bq * bk * 4                 # s/p/dp/ds + casts
                + 2 * 2 * bq * 128 * 4)           # lse + delta tiles

    # this estimate counts lane padding and double-buffering explicitly
    # (unlike the fwd's 1.9x-fudged one), so it can run closer to the
    # 16 MB hardware cap; 12 MB keeps the decoder's [60, 4096, 32] site
    # at 512x512 blocks (est 10.1 MB) instead of a launch-bound 256x256
    _BWD_BUDGET = 12 * 1024 * 1024
    while _est(block_q, block_k) > _BWD_BUDGET \
            and max(block_q, block_k) > 128:
        if block_q >= block_k:
            block_q = _pick_block(tq, block_q // 2)
        else:
            block_k = _pick_block(tk, block_k // 2)
    if _est(block_q, block_k) > _BWD_BUDGET:
        return None

    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, d_p - d))
                 ).reshape(bh, tq_p, d_p)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d))
                 ).reshape(bh, tk_p, d_p)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d))
                 ).reshape(bh, tk_p, d_p)
    gf = jnp.pad(g.astype(q.dtype),
                 ((0, 0), (0, 0), (0, tq_p - tq), (0, d_p - d))
                 ).reshape(bh, tq_p, d_p)
    # delta_i = sum_d g_i * out_i (the softmax-jacobian row term)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(bh, tq)
    delta = jnp.pad(delta, ((0, 0), (0, tq_p - tq)))[..., None]
    lsef = jnp.pad(lse.reshape(bh, tq), ((0, 0), (0, tq_p - tq)))[..., None]

    num_kb = tk_p // block_k
    num_qb = tq_p // block_q
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, q_len=tq,
                          kv_len=tk, block_q=block_q, block_k=block_k,
                          num_kb=num_kb, num_qb=num_qb),
        grid=(bh, num_kb, num_qb),
        in_specs=[
            pl.BlockSpec((None, block_q, d_p),
                         lambda bi, ki, qi: (bi, qi, 0)),
            pl.BlockSpec((None, block_k, d_p),
                         lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((None, block_k, d_p),
                         lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((None, block_q, d_p),
                         lambda bi, ki, qi: (bi, qi, 0)),
            pl.BlockSpec((None, block_q, 1),
                         lambda bi, ki, qi: (bi, qi, 0)),
            pl.BlockSpec((None, block_q, 1),
                         lambda bi, ki, qi: (bi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d_p),
                         lambda bi, ki, qi: (bi, qi, 0)),
            pl.BlockSpec((None, block_k, d_p),
                         lambda bi, ki, qi: (bi, ki, 0)),
            pl.BlockSpec((None, block_k, d_p),
                         lambda bi, ki, qi: (bi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((bh, tk_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_p, d_p), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq_p, d_p), jnp.float32),
            pltpu.VMEM((block_k, d_p), jnp.float32),
            pltpu.VMEM((block_k, d_p), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, delta)

    dq = dq.reshape(b, h, tq_p, d_p)[:, :, :tq, :d].astype(q.dtype)
    dk = dk.reshape(b, h, tk_p, d_p)[:, :, :tk, :d].astype(k.dtype)
    dv = dv.reshape(b, h, tk_p, d_p)[:, :, :tk, :d].astype(v.dtype)
    return dq, dk, dv


def _flash_bwd_bias_kernel(q_ref, k_ref, v_ref, b_ref, g_ref, lse_ref,
                           delta_ref, dq_ref, dk_ref, dv_ref, db_ref,
                           dq_acc_ref, dk_acc_ref, dv_acc_ref, db_acc_ref,
                           *, scale: float, q_len: int, kv_len: int,
                           block_q: int, block_k: int, num_kb: int,
                           num_qb: int, num_r: int):
    """Biased flash-attention backward (the prior's RelPosBias path).

    Grid (bias_groups, replicas, kv_blocks, q_blocks): the bias array is
    normalized to [N, Tq, Tk] with N in {1, h, b*h}; `replicas` are the
    b*h rows sharing each bias group, so dbias accumulates across the
    replica axis in a whole-[Tq_p, Tk_p] f32 scratch (flushed at the
    last replica), while dq/dk/dv follow the unbiased kernel's pattern
    within each (group, replica) pair. ds feeds dbias UNSCALED (the
    bias adds after the q·k scale)."""
    ri = pl.program_id(1)
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init_dkdv():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    kb = k_ref[...]                                     # [Bk, D]
    vb = v_ref[...]
    qs = q_ref[...]                                     # [Bq, D]
    gs = g_ref[...]
    lse = lse_ref[...]                                  # [Bq, 1] f32
    dlt = delta_ref[...]

    s = jax.lax.dot_general(qs, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + b_ref[...].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < kv_len, s, _NEG_INF)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
    p = jnp.where(row < q_len, jnp.exp(s - lse), 0.0)
    pv = p.astype(vb.dtype)
    dv_acc_ref[...] += jax.lax.dot_general(
        pv, gs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gs, vb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds_u = p * (dp - dlt)                               # unscaled: dbias
    sl_q = pl.ds(qi * block_q, block_q)
    sl_k = pl.ds(ki * block_k, block_k)
    db_acc_ref[sl_q, sl_k] = jnp.where(
        ri == 0, ds_u, db_acc_ref[sl_q, sl_k] + ds_u)
    ds = (ds_u * scale).astype(kb.dtype)
    dk_acc_ref[...] += jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_upd = jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dq_acc_ref[sl_q, :] = jnp.where(
        ki == 0, dq_upd, dq_acc_ref[sl_q, :] + dq_upd)

    @pl.when(qi == num_qb - 1)
    def _flush_dkdv():
        dk_ref[...] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc_ref[...].astype(dv_ref.dtype)

    @pl.when(ki == num_kb - 1)
    def _flush_dq():
        dq_ref[...] = dq_acc_ref[sl_q, :].astype(dq_ref.dtype)

    @pl.when(ri == num_r - 1)
    def _flush_db():
        db_ref[...] = db_acc_ref[sl_q, sl_k].astype(db_ref.dtype)


def _flash_bwd_pallas_bias(q, k, v, bias, g, out, lse, scale, interpret):
    """Dispatch wrapper for `_flash_bwd_bias_kernel`. Returns
    (dq, dk, dv, dbias) or None when the whole-[Tq, Tk] dbias scratch
    would not fit the VMEM budget (the caller then takes the q-chunked
    XLA backward)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bh = b * h
    # multi-query k/v [B, 1, Tk, D]: the kernel reads the SHARED kv row
    # for every head (no broadcast materialized); dk/dv still come out
    # per-(b, h) and are head-summed after (a tiny f32 reduction — the
    # r2 loss was materializing + padding broadcast K/V into residuals)
    mq = k.shape[1] == 1 and h > 1
    h_kv = 1 if mq else h
    d_p = d if d % 8 == 0 else _round_up(d, 8)
    esize = jnp.dtype(q.dtype).itemsize
    d_v = max(d_p, 128)

    # normalize bias to [N, tq, tk], N in {1, h, b*h} (fwd convention)
    bias4 = bias.reshape((1,) * (4 - bias.ndim) + bias.shape)
    bb, bh_ = bias4.shape[:2]
    if not ((bb == 1 or bb == b) and (bh_ == 1 or bh_ == h)):
        return None
    n_groups = bb * bh_
    if n_groups == bh:                    # per-(b, h) bias: no reduction
        num_r, row_of = 1, (lambda g_, r_: g_)
    elif n_groups == 1:                   # shared bias: sum over b*h
        num_r, row_of = bh, (lambda g_, r_: r_)
    elif bh_ == h:                        # per-head bias: sum over b
        num_r, row_of = b, (lambda g_, r_, h_=h: r_ * h_ + g_)
    else:                                 # per-batch bias [b,1,tq,tk]
        num_r, row_of = h, (lambda g_, r_, h_=h: g_ * h_ + r_)

    block_q = _pick_block(tq, 512)
    block_k = _pick_block(tk, 512)

    def _est(bq, bk):
        tq_p = _round_up(tq, bq)
        tk_p = _round_up(tk, bk)
        return (tq_p * tk_p * 4                   # dbias f32 accumulator
                + tq_p * d_v * 4                  # dq f32 accumulator
                + 2 * bq * d_v * (3 * esize)      # q, g, dq out (dbl-buf)
                + 8 * bk * d_v * esize            # k/v + dk/dv (dbl-buf)
                + 2 * bk * d_v * 4                # dk/dv f32 scratch
                + 6 * bq * bk * 4                 # s/p/dp/ds + bias + db out
                + 2 * 2 * bq * 128 * 4)           # lse + delta tiles

    _BWD_BUDGET = 12 * 1024 * 1024
    while _est(block_q, block_k) > _BWD_BUDGET \
            and max(block_q, block_k) > 128:
        if block_q >= block_k:
            block_q = _pick_block(tq, block_q // 2)
        else:
            block_k = _pick_block(tk, block_k // 2)
    if _est(block_q, block_k) > _BWD_BUDGET:
        return None

    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, d_p - d))
                 ).reshape(bh, tq_p, d_p)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d))
                 ).reshape(b * h_kv, tk_p, d_p)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d))
                 ).reshape(b * h_kv, tk_p, d_p)
    gf = jnp.pad(g.astype(q.dtype),
                 ((0, 0), (0, 0), (0, tq_p - tq), (0, d_p - d))
                 ).reshape(bh, tq_p, d_p)
    biasf = jnp.pad(bias4.reshape(n_groups, tq, tk).astype(jnp.float32),
                    ((0, 0), (0, tq_p - tq), (0, tk_p - tk)))
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(bh, tq)
    delta = jnp.pad(delta, ((0, 0), (0, tq_p - tq)))[..., None]
    lsef = jnp.pad(lse.reshape(bh, tq), ((0, 0), (0, tq_p - tq)))[..., None]

    num_kb = tk_p // block_k
    num_qb = tq_p // block_q
    qspec = pl.BlockSpec((None, block_q, d_p),
                         lambda gi, ri, ki, qi: (row_of(gi, ri), qi, 0))
    # k/v INPUT row: the shared kv row under multi-query, else per-head
    kv_of = ((lambda g_, r_: row_of(g_, r_) // h) if mq else row_of)
    kspec_in = pl.BlockSpec((None, block_k, d_p),
                            lambda gi, ri, ki, qi: (kv_of(gi, ri), ki, 0))
    # dk/dv OUTPUT rows stay per-(b, h); head-summed after the call
    kspec_out = pl.BlockSpec((None, block_k, d_p),
                             lambda gi, ri, ki, qi: (row_of(gi, ri), ki, 0))
    vecspec = pl.BlockSpec((None, block_q, 1),
                           lambda gi, ri, ki, qi: (row_of(gi, ri), qi, 0))
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_flash_bwd_bias_kernel, scale=scale, q_len=tq,
                          kv_len=tk, block_q=block_q, block_k=block_k,
                          num_kb=num_kb, num_qb=num_qb, num_r=num_r),
        grid=(n_groups, num_r, num_kb, num_qb),
        in_specs=[
            qspec, kspec_in, kspec_in,
            pl.BlockSpec((None, block_q, block_k),
                         lambda gi, ri, ki, qi: (gi, qi, ki)),
            qspec, vecspec, vecspec,
        ],
        out_specs=[
            qspec, kspec_out, kspec_out,
            pl.BlockSpec((None, block_q, block_k),
                         lambda gi, ri, ki, qi: (gi, qi, ki)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((bh, tk_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_p, d_p), v.dtype),
            jax.ShapeDtypeStruct((n_groups, tq_p, tk_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq_p, d_p), jnp.float32),
            pltpu.VMEM((block_k, d_p), jnp.float32),
            pltpu.VMEM((block_k, d_p), jnp.float32),
            pltpu.VMEM((tq_p, tk_p), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, biasf, gf, lsef, delta)

    dq = dq.reshape(b, h, tq_p, d_p)[:, :, :tq, :d].astype(q.dtype)
    dk = dk.reshape(b, h, tk_p, d_p)[:, :, :tk, :d]
    dv = dv.reshape(b, h, tk_p, d_p)[:, :, :tk, :d]
    if mq:  # grad of the head share: f32 sum over heads
        dk = dk.astype(jnp.float32).sum(axis=1, keepdims=True)
        dv = dv.astype(jnp.float32).sum(axis=1, keepdims=True)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)
    db = db[:, :tq, :tk].reshape(bias4.shape[:2] + (tq, tk))
    db = db.reshape(bias.shape).astype(bias.dtype)
    return dq, dk, dv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    scale: Optional[float] = None,
                    block_q: int = 256, block_k: int = 256,
                    interpret: bool = False) -> jax.Array:
    """Pallas flash attention. q: [B, H, Tq, D], k/v: [B, H, Tk, D] —
    or multi-query [B, 1, Tk, D] shared across q's heads (the prior's
    layout): the kernels read the shared kv row through the BlockSpec
    index map, never materializing the broadcast, and dk/dv come back
    head-summed at [B, 1, Tk, D].

    `bias` is an optional additive attention bias broadcastable to
    [B, H, Tq, Tk] (accepted as [Tq, Tk] / [H, Tq, Tk] / [B, H, Tq, Tk]) —
    the diffusion prior's RelPosBias path. Biased attention takes the
    whole-KV kernel when the KV window fits VMEM, else the XLA reference.

    Pads Tq/Tk to block multiples and D to the sublane boundary; padded kv
    columns are masked in-kernel, padded q rows are sliced off after.

    Differentiable: pallas_call has no autodiff rule, so a custom VJP
    recomputes the backward through the XLA reference attention (exact
    same math up to softmax recompute roundoff) — forward takes the fast
    kernel, training gradients stay correct. Memory of the backward is
    the O(Tq*Tk) logits matrix, fine at this framework's shapes."""
    return _flash_attention_impl(q, k, v, bias, scale, block_q, block_k,
                                 interpret)


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    if os.environ.get("NEURONS_TPU_PALLAS_BWD", "1") == "1":
        # training path: the forward also emits per-row log-sum-exp so
        # the backward can be the Pallas recompute kernel (lse comes
        # back None when a biased shape fell back to the XLA forward)
        out, lse = _flash_attention_impl(q, k, v, bias, scale, block_q,
                                         block_k, interpret,
                                         return_lse=True)
        return out, (q, k, v, bias, out, lse)
    out = _flash_attention_impl(q, k, v, bias, scale, block_q, block_k,
                                interpret)
    return out, (q, k, v, bias, None, None)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    """Attention backward. With forward-saved log-sum-exp (unbiased
    training path) this dispatches to the Pallas recompute kernel
    (`_flash_bwd_kernel`); otherwise — bias present, VMEM-ineligible
    shape, or NEURONS_TPU_PALLAS_BWD=0 — it falls back to the
    q-chunked backward (flash-style, XLA) below: the naive
    recompute-everything backward materializes the [BH, Tq, Tk] weight
    matrix — 4 GB per 4096-token site in the stage-2 decoder, which
    OOM'd HBM. The scan recomputes softmax per q-chunk, so transient
    memory is O(chunk * Tk) while dk/dv accumulate in f32."""
    q, k, v, bias, out, lse = res
    if lse is not None:
        if scale is None:
            scale_ = q.shape[-1] ** -0.5
        else:
            scale_ = scale
        if bias is not None:
            # natively multi-query-aware (reads the shared kv row,
            # head-sums dk/dv)
            rb = _flash_bwd_pallas_bias(q, k, v, bias, g, out, lse,
                                        scale_, interpret)
            if rb is not None:
                return rb
    # the remaining paths are dense: realize the multi-query broadcast
    # (XLA fuses it into the einsums) and head-sum dk/dv at the end
    mq_shape = None
    if k.ndim == 4 and k.shape[1] == 1 and q.shape[1] != 1:
        mq_shape = k.shape
        k = jnp.broadcast_to(k, q.shape[:2] + k.shape[2:])
        v = jnp.broadcast_to(v, q.shape[:2] + v.shape[2:])

    def _mq_reduce(dk, dv):
        if mq_shape is None:
            return dk, dv
        return (dk.astype(jnp.float32).sum(axis=1, keepdims=True)
                .astype(dk.dtype),
                dv.astype(jnp.float32).sum(axis=1, keepdims=True)
                .astype(dv.dtype))

    if lse is not None and bias is None:
        r = _flash_bwd_pallas(q, k, v, g, out, lse, scale_, interpret)
        if r is not None:
            dq, dk, dv = r
            dk, dv = _mq_reduce(dk, dv)
            return (dq, dk, dv, None)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, tq, d_ = q.shape
    tk = k.shape[2]
    bh = b * h
    qf = q.reshape(bh, tq, d_)
    kf = k.reshape(bh, tk, d_)
    vf = v.reshape(bh, tk, d_)
    gf = g.reshape(bh, tq, d_)
    ch = min(512, tq)
    tq_p = _round_up(tq, ch)
    bias_p = None
    if bias is not None:
        # keep the bias UN-broadcast ([Tq,Tk] / [h,Tq,Tk] / [b,h,Tq,Tk]):
        # broadcasting to [bh,Tq,Tk] scan xs would materialize the full
        # logits-sized matrix the chunking exists to avoid; instead each
        # step dynamic-slices its q-rows and lets the [b,h,ch,Tk] view of
        # s broadcast the add
        bias_p = bias.astype(jnp.float32)
    if tq_p != tq:
        # zero-padded g rows contribute nothing to ds/dv (see below), so
        # any FINITE bias pad works; 0 keeps the padded rows' softmax
        # well-conditioned (a true -inf pad would NaN-poison dk/dv)
        qf = jnp.pad(qf, ((0, 0), (0, tq_p - tq), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, tq_p - tq), (0, 0)))
        if bias_p is not None:
            pad = [(0, 0)] * (bias_p.ndim - 2) + [(0, tq_p - tq), (0, 0)]
            bias_p = jnp.pad(bias_p, pad)
    nc = tq_p // ch
    qc_all = qf.reshape(bh, nc, ch, d_).transpose(1, 0, 2, 3)
    gc_all = gf.reshape(bh, nc, ch, d_).transpose(1, 0, 2, 3)

    def step(carry, args):
        dk, dv = carry
        qc, gc, ci = args  # [bh, ch, D], chunk index
        s = jnp.einsum("bqd,bkd->bqk", qc, kf,
                       preferred_element_type=jnp.float32) * scale
        if bias_p is not None:
            bc = jax.lax.dynamic_slice_in_dim(bias_p, ci * ch, ch,
                                              axis=bias_p.ndim - 2)
            s = (s.reshape(b, h, ch, tk) + bc).reshape(bh, ch, tk)
        p = jax.nn.softmax(s, axis=-1)
        pv = p.astype(vf.dtype)
        dv = dv + jnp.einsum("bqk,bqd->bkd", pv, gc,
                             preferred_element_type=jnp.float32)
        dp = jnp.einsum("bqd,bkd->bqk", gc, vf,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsv = ds.astype(kf.dtype)
        dq_c = jnp.einsum("bqk,bkd->bqd", dsv, kf,
                          preferred_element_type=jnp.float32) * scale
        dk = dk + jnp.einsum("bqk,bqd->bkd", dsv, qc,
                             preferred_element_type=jnp.float32) * scale
        # reduce dbias over the broadcast axes INSIDE the scan so the
        # stacked per-chunk output matches the bias' own shape — stacking
        # full ds would rematerialize the bh*Tq*Tk matrix the chunking
        # exists to avoid
        if bias_p is None:
            db_c = None
        elif bias.ndim == 2:
            db_c = ds.sum(axis=0)                           # [ch, tk]
        elif bias.ndim == 3:
            db_c = ds.reshape(b, h, ch, tk).sum(axis=0)     # [h, ch, tk]
        else:
            db_c = ds.reshape(b, h, ch, tk)                 # [b,h,ch,tk]
        return (dk, dv), (dq_c, db_c)

    zero = jnp.zeros((bh, tk, d_), jnp.float32)
    (dk, dv), (dq_chunks, db_chunks) = jax.lax.scan(
        step, (zero, zero), (qc_all, gc_all, jnp.arange(nc)))
    dq = dq_chunks.transpose(1, 0, 2, 3).reshape(bh, tq_p, d_)[:, :tq]
    dbias = None
    if bias_p is not None:
        # [nc, ..., ch, tk] -> [..., tq, tk]: move the chunk axis next to
        # ch and merge, then drop the padded rows
        nd = db_chunks.ndim
        perm = tuple(range(1, nd - 2)) + (0, nd - 2, nd - 1)
        lead = db_chunks.shape[1:nd - 2]
        dbias = (db_chunks.transpose(perm)
                 .reshape(lead + (tq_p, tk))[..., :tq, :]
                 .astype(bias.dtype))
    dk, dv = _mq_reduce(dk.reshape(k.shape), dv.reshape(v.shape))
    return (dq.reshape(q.shape).astype(q.dtype),
            dk.astype(k.dtype), dv.astype(v.dtype), dbias)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "return_lse"))
def _flash_attention_impl(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: Optional[jax.Array] = None,
                          scale: Optional[float] = None,
                          block_q: int = 256, block_k: int = 256,
                          interpret: bool = False,
                          return_lse: bool = False) -> jax.Array:
    """With return_lse=True (the VJP forward), additionally returns the
    per-row log-sum-exp [B, H, Tq] f32 for the Pallas backward kernel —
    or None for it when a biased shape falls back to the XLA reference
    (bias is only kernelized in the whole-KV regime)."""
    if (bias is not None and not return_lse
            and os.environ.get("NEURONS_TPU_BIAS_FLASH", "0") != "1"):
        # primal (inference) biased path: A/B on the honest e2e bench
        # showed XLA's fused softmax wins at the prior's 513-token rows
        # (6.233 vs 6.249 s/clip) — the kernel fwd is reserved for the
        # VJP forward, where it feeds the Pallas backward
        return xla_attention(q, k, v, bias=bias, scale=scale)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, tq, d = q.shape
    tk = k.shape[2]
    # multi-query: k/v [B, 1, Tk, D] shared across q's H heads (the
    # prior's layout). The kernels read the shared row via the BlockSpec
    # index map — no [B, H, Tk, D] broadcast is ever materialized.
    mq = k.shape[1] == 1 and h > 1

    # sublane-aligned head dims (64 in the unCLIP UNet, 40/80/160 in the
    # video UNet) stay unpadded: Mosaic tiles the short minor dim in VMEM
    # for free, while an explicit pad to 128 materializes padded q/k/v
    # copies in HBM (and 1.6x-2x dead MXU work). Other dims pad to the
    # 8-sublane boundary (the prior's d=52 -> 56, not 128).
    d_p = d if d % 8 == 0 else _round_up(d, 8)
    esize = jnp.dtype(q.dtype).itemsize  # 2 bf16 (bench) / 4 f32 (train)

    def _vmem_est(bq, bk):
        """Scoped-VMEM footprint of one whole-KV program: resident K+V
        (padded to the block multiple ACTUALLY used, not just 128),
        q tile + f32 accumulator, f32 logits + value-dtype probs, and the
        resident bias tile when present."""
        rows = _round_up(tk, bk)
        est = (2 * rows * d_p * esize
               + bq * d_p * (esize + 4)
               # pv @ v's f32 dot accumulation buffer: negligible at the
               # UNet's d<=160 but decisive at the VAE mid-attention's
               # d=512, where omitting it grew blocks into a 16.18M
               # scoped-VMEM stack (16M limit; caught by the 50-clip
               # e2e drive at [32,1024,512])
               + bq * d_p * 4
               + bq * bk * (4 + esize))
        if bias is not None:
            est += bq * rows * jnp.dtype(bias.dtype).itemsize
        return est

    # whole-KV sites are launch/loop-overhead bound at small blocks
    # (34 us of math took 250 us at 3x192 on the 576-token mid stage) —
    # grow blocks until the estimate hits the budget. Calibration: real
    # scoped-VMEM use runs ~1.9x this estimate (double-buffered tiles +
    # the exp intermediate) against the 16 MB cap, so 8 MB keeps the
    # tuned bf16 bench configs (est 6.7 MB -> ~12.7 MB real) while
    # downgrading the f32 training case that overflowed (est 9.9 MB ->
    # 18.7 MB real, observed OOM)
    # whole-KV only up to tk*itemsize = 4.6 KB/row (2304 tokens bf16 /
    # 1152 f32): the 4096-token f32 training case measured ~18 MB scoped
    # VMEM regardless of block_k (Mosaic stack allocation scales with the
    # resident KV window) and must stream
    smallkv_hint = (_round_up(tk, 128) * esize <= 4608 and
                    _vmem_est(_pick_block(tq, block_q),
                              _pick_block(tk, block_k)) <= _BUDGET)
    if smallkv_hint and d_p <= 256:
        # block growth is tuned for the UNets' d<=160; at the VAE
        # mid-attention's d=512 the Mosaic stack blows the 16M scoped
        # cap even where the estimate passes (measured 16.18M at
        # [32,1024,512] bq=1024) — keep the 256 defaults there
        cap_q, cap_k = block_q, block_k
        while cap_q < min(tq, 2048) and _vmem_est(
                _pick_block(tq, cap_q * 2),
                _pick_block(tk, cap_k)) <= _BUDGET:
            cap_q *= 2
        while cap_k < min(tk, 2048) and _vmem_est(
                _pick_block(tq, cap_q),
                _pick_block(tk, cap_k * 2)) <= _BUDGET:
            cap_k *= 2
        block_q, block_k = cap_q, cap_k
    else:
        # streaming-grid programs are launch-overhead bound at the
        # default 256x256 blocks when d is small: the stage-2 decoder's
        # [60,1,4096,32] spatial attention ran 15360 programs of ~4
        # MFLOP each (14.8 ms/site measured vs a ~6 ms matmul+softmax
        # roofline). Grow blocks under the same VMEM budget — per
        # program: q tile + f32 out accumulator, double K/V tiles,
        # f32 logits + value-dtype probs, scratch accumulators.
        def _stream_est(bq, bk):
            return (bq * d_p * (esize + 4) + 2 * bk * d_p * esize
                    + bq * bk * (4 + esize) + 4 * bq * (d_p + 2))

        cap_q, cap_k = block_q, block_k
        while cap_q < min(tq, 1024) and _stream_est(
                _pick_block(tq, cap_q * 2),
                _pick_block(tk, cap_k)) <= _BUDGET:
            cap_q *= 2
        while cap_k < min(tk, 1024) and _stream_est(
                _pick_block(tq, cap_q),
                _pick_block(tk, cap_k * 2)) <= _BUDGET:
            cap_k *= 2
        block_q, block_k = cap_q, cap_k
    block_q = _pick_block(tq, block_q)
    block_k = _pick_block(tk, block_k)
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, block_k)

    h_kv = 1 if mq else h
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d)))

    qf = qp.reshape(b * h, tq_p, d_p)
    kf = kp.reshape(b * h_kv, tk_p, d_p)
    vf = vp.reshape(b * h_kv, tk_p, d_p)
    # program (b, h) -> its kv row
    kv_of = (lambda bhid: bhid // h) if mq else (lambda bhid: bhid)

    num_kb = tk_p // block_k
    # whole-KV kernel while the program's footprint fits the budget;
    # streaming grid with scratch accumulators beyond that (e.g. the
    # 9216-token VAE mid-attention, whose whole-KV residency blew the
    # 16 MB scoped cap)
    smallkv = (tk_p * esize <= 4608
               and _vmem_est(block_q, block_k) <= _BUDGET)  # rows == tk_p here
    if bias is not None and not smallkv:
        # biased attention is only kernelized in the whole-KV regime (the
        # 513-token prior); larger biased shapes take the XLA reference
        out = xla_attention(q, k, v, bias=bias, scale=scale)
        return (out, None) if return_lse else out
    if smallkv:
        if bias is not None:
            # normalize bias to [N, Tq_p, Tk_p], N in {1, h, b*h}; the
            # index map below folds the (b, h) program id onto it
            bias4 = bias.reshape((1,) * (4 - bias.ndim) + bias.shape)
            bb, bh_ = bias4.shape[:2]
            bias_n = bb * bh_
            biasf = bias4.reshape(bias_n, tq, tk)
            biasf = jnp.pad(biasf,
                            ((0, 0), (0, tq_p - tq), (0, tk_p - tk)))
            if bias_n == 1:
                bmap = lambda bhid, qi: (0, qi, 0)
            elif bb == 1:                   # per-head bias, shared over b
                bmap = lambda bhid, qi: (bhid % h, qi, 0)
            else:
                assert bb == b and bh_ == h, (
                    f"bias batch/head dims {bias4.shape[:2]} must be 1 or "
                    f"match q's ({b}, {h})")
                bmap = lambda bhid, qi: (bhid, qi, 0)
            call_args = (qf, kf, vf, biasf)
        else:
            call_args = (qf, kf, vf)
        kernel = (_flash_kernel_smallkv_bias if bias is not None
                  else _flash_kernel_smallkv)
        in_specs = [
            pl.BlockSpec((None, block_q, d_p), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((None, tk_p, d_p),
                         lambda bh, qi: (kv_of(bh), 0, 0)),
            pl.BlockSpec((None, tk_p, d_p),
                         lambda bh, qi: (kv_of(bh), 0, 0)),
        ]
        if bias is not None:
            in_specs.append(pl.BlockSpec((None, block_q, tk_p), bmap))
        out_specs = pl.BlockSpec((None, block_q, d_p),
                                 lambda bh, qi: (bh, qi, 0))
        out_shape = jax.ShapeDtypeStruct((b * h, tq_p, d_p), q.dtype)
        if return_lse:
            out_specs = [out_specs,
                         pl.BlockSpec((None, block_q, 1),
                                      lambda bh, qi: (bh, qi, 0))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((b * h, tq_p, 1),
                                              jnp.float32)]
        call = pl.pallas_call(
            functools.partial(kernel, scale=scale, kv_len=tk,
                              block_k=block_k),
            grid=(b * h, tq_p // block_q),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )
        probe = (os.environ.get("NEURONS_TPU_VMEM_PROBE") == "1"
                 and not interpret and _on_tpu())
        cfg_key = ("smallkv", b * h, tq_p, tk_p, d_p, block_q, block_k,
                   str(q.dtype), bias is not None, return_lse)
        if not probe or _probe_ok(cfg_key, call, call_args):
            out = call(*call_args)
            if return_lse:
                out, lse = out
                return (out.reshape(b, h, tq_p, d_p)[:, :, :tq, :d],
                        lse.reshape(b, h, tq_p)[:, :, :tq])
            return out.reshape(b, h, tq_p, d_p)[:, :, :tq, :d]
        # probe rejected the whole-KV config: biased shapes take the XLA
        # reference, unbiased fall through to the streaming kernel with
        # the base (ungrown) blocks re-derived + re-padded
        if bias is not None:
            out = xla_attention(q, k, v, bias=bias, scale=scale)
            return (out, None) if return_lse else out
        block_q = _pick_block(tq, 256)
        block_k = _pick_block(tk, 256)
        tq_p = _round_up(tq, block_q)
        tk_p = _round_up(tk, block_k)
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, d_p - d)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, d_p - d)))
        qf = qp.reshape(b * h, tq_p, d_p)
        kf = kp.reshape(b * h_kv, tk_p, d_p)
        vf = vp.reshape(b * h_kv, tk_p, d_p)
        num_kb = tk_p // block_k

    grid = (b * h, tq_p // block_q, num_kb)
    out_specs = pl.BlockSpec((None, block_q, d_p),
                             lambda bh, qi, ki: (bh, qi, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, tq_p, d_p), q.dtype)
    if return_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((None, block_q, 1),
                                  lambda bh, qi, ki: (bh, qi, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b * h, tq_p, 1), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=tk,
                          block_k=block_k, num_kb=num_kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d_p),
                         lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((None, block_k, d_p),
                         lambda bh, qi, ki: (kv_of(bh), ki, 0)),
            pl.BlockSpec((None, block_k, d_p),
                         lambda bh, qi, ki: (kv_of(bh), ki, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d_p), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)

    if return_lse:
        out, lse = out
        return (out.reshape(b, h, tq_p, d_p)[:, :, :tq, :d],
                lse.reshape(b, h, tq_p)[:, :, :tq])
    return out.reshape(b, h, tq_p, d_p)[:, :, :tq, :d]


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: Optional[jax.Array] = None,
                          mask: Optional[jax.Array] = None,
                          scale: Optional[float] = None) -> jax.Array:
    """Dispatching attention entry point. [B, H, T, D] layout.

    Uses the Pallas flash kernel on TPU for unmasked attention with enough
    rows to fill tiles — including additive-bias attention (the prior's
    RelPosBias, whole-KV kernel); otherwise the XLA path (which XLA fuses
    well at small sizes, and which supports mask).
    """
    use_pallas = (
        _HAS_PALLAS and _on_tpu() and mask is None
        and q.shape[-2] >= 128 and k.shape[-2] >= 128
        and os.environ.get("NEURONS_TPU_NO_PALLAS") != "1"  # A/B knob
    )
    if use_pallas and bias is not None:
        # biased-attention routing, measured on the prior's multi-query
        # 513-token rows (A/B on the honest benches):
        #  - INFERENCE fwd keeps XLA either way: the kernel impl's
        #    primal biased path falls back to the XLA reference itself
        #    (bias-flash fwd measured 6.249 s/clip vs XLA 6.233);
        #  - TRAINING with MULTI-QUERY k/v [B,1,Tk,D] defaults to the
        #    custom-VJP kernels (lse-emitting fwd + Pallas bias bwd):
        #    r3 A/B 282.0 vs 285.7 ms/step on the stage-2 step. Round
        #    2's 293-vs-284 loss came from materializing + padding the
        #    h-broadcast K/V into residuals; the kernels now read the
        #    shared kv row via the index map, so the broadcast never
        #    exists.
        #  - dense-biased shapes (k carries all H heads) stay on XLA
        #    unless NEURONS_TPU_BIAS_FLASH=1 — unmeasured territory.
        env = os.environ.get("NEURONS_TPU_BIAS_FLASH", "")
        mq = k.ndim == 4 and k.shape[1] == 1 and q.shape[1] != 1
        use_pallas = env == "1" or (mq and env != "0")
    if use_pallas:
        return flash_attention(q, k, v, bias=bias, scale=scale)
    return xla_attention(q, k, v, bias=bias, mask=mask, scale=scale)
