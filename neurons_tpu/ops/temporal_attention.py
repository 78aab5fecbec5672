"""Fused temporal (per-pixel, across-frame) attention for the motion
modules (reference motion_module.py:236-312 VersatileAttention with
attention_mode="Temporal").

Why a kernel: the motion module attends over F=16 frames per pixel —
16x16 logits, trivial FLOPs — but every XLA formulation materializes
layout copies of the full [B, F, D, H, hd] activation around the
batched einsums (profiled r2 on v5e: ~0.8 s of the 6.25 s/clip honest
bench is temporal-attention copies + f32 logits traffic). This kernel
computes the whole attention IN the producer layout [(B F), D, C]
(C minor, exactly how the to_q/k/v matmuls emit it): one read of
q/k/v, one write of out, zero transposes.

Layout trick: with H heads and F frames, all (head, frame) logits for
one (pixel, query-frame) row live in F*H lanes — for the production
shape F=16, H=8 that is exactly 128, one full vector register row.
  * logits: for each key frame j, (q * k_j) is reduced per-head by one
    full-width MXU matmul against a 0/1 segment selector S_j[c, F*H]
    with S_j[cc, j*H + cc//hd] = 1 — accumulating straight into the
    lane-packed [F*dblk, F*H] logits block.
  * softmax over key frames (lanes strided by H) is a log2(F)-step
    lane-roll tree — no relayouting reshapes.
  * output: W @ E_j (E_j = S_j^T) extracts frame-j weights AND
    broadcasts each head weight across its hd lanes in one matmul;
    a VPU FMA with v_j accumulates the context.

Numerics: f32 logits/softmax and f32 context accumulation, like the
einsum reference. For bf16 inputs the q*k products are rounded to bf16
before the selector matmul — measured against a float64 oracle at the
production shape this sits at the SAME bf16 noise floor as the XLA
einsum reference (kernel 0.220% rms vs reference's own 0.233% rms;
tests/test_temporal_attention.py pins the invariant), so the rounding
is decorrelated noise, not added error. NEURONS_TPU_TA_COMPENSATED=1
switches to hi+lo compensated products (two MXU matmuls) that track
the reference's exact-product accumulation to ~2^-16 — useful for
bit-level A/Bs against the XLA path, costs ~0.2 s/clip on the honest
bench (5.75 vs 5.90). The backward is the reference path's VJP (exact;
the temporal sites are frozen at inference, so backward perf is not
hot).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurons_tpu.ops.attention import _on_tpu

# target per-input VMEM tile ~0.65 MB bf16: f * dblk * c * 2B with
# dblk * c capped at 20480 elements (c=320 -> dblk 64, 640 -> 32,
# 1280 -> 16); inputs are triple + double-buffered, logits/context
# accumulators are f32
_DBLK_ELEM_CAP = 20480


def temporal_attention_reference(q, k, v, n_frames: int, heads: int,
                                 scale: float):
    """Einsum reference: q/k/v [(B F), D, C] -> [(B F), D, C].

    Per-pixel attention across frames, heads split from C. This is the
    formulation XLA handles best without the kernel (batched einsums
    over the [B, F, D, H, hd] view)."""
    bf, d, c = q.shape
    f = n_frames
    b = bf // f
    h = heads
    hd = c // h

    def split(y):
        return y.reshape(b, f, d, h, hd)

    qs, ks, vs = split(q), split(k), split(v)
    logits = jnp.einsum("bidhk,bjdhk->bdhij", qs, ks,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bdhij,bjdhk->bidhk", w, vs)
    return out.reshape(bf, d, c)


def _roll_lanes(x, shift, interpret):
    if interpret:
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift=shift, axis=1)


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, f: int, h: int,
                     hd: int, scale: float, interpret: bool,
                     compensate: bool):
    c = h * hd
    fh = f * h
    dblk = q_ref.shape[1]
    rows = f * dblk
    q = q_ref[...]                       # [f, dblk, c]
    k = k_ref[...]
    v = v_ref[...]

    # selector tables: cc (channel) on one axis, packed lane on the other
    cc_s = jax.lax.broadcasted_iota(jnp.int32, (c, fh), 0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (c, fh), 1)
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (fh, c), 0)
    cc_e = jax.lax.broadcasted_iota(jnp.int32, (fh, c), 1)

    compensate = compensate and q.dtype == jnp.bfloat16
    qf = q.astype(jnp.float32) if compensate else q
    logits = jnp.zeros((rows, fh), jnp.float32)
    for j in range(f):
        sj = (lane_s == j * h + cc_s // hd).astype(q.dtype)     # [c, fh]
        if compensate:
            # exact-product accumulation: round the f32 product to a
            # bf16 hi+lo pair and run both through the (0/1, exact in
            # bf16) selector — two full-rate MXU matmuls reproduce the
            # reference einsum's exact-product f32 accumulation
            p32 = (qf * k[j][None].astype(jnp.float32)).reshape(rows, c)
            hi = p32.astype(jnp.bfloat16)
            lo = (p32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            logits = (logits
                      + jnp.dot(hi, sj, preferred_element_type=jnp.float32)
                      + jnp.dot(lo, sj, preferred_element_type=jnp.float32))
        else:
            # bf16-rounded products: same 0.22% rms noise floor vs f64
            # as the reference's own bf16 path (module docstring)
            prod = (q * k[j][None]).reshape(rows, c)
            logits = logits + jnp.dot(prod, sj,
                                      preferred_element_type=jnp.float32)
    logits = logits * scale

    # softmax over key frames: each head's F logits sit in lanes
    # {j*h + r}, stride h — a lane-roll tree all-reduces each class
    m = logits
    shift = h
    while shift < fh:
        m = jnp.maximum(m, _roll_lanes(m, shift, interpret))
        shift *= 2
    e = jnp.exp(logits - m)
    s = e
    shift = h
    while shift < fh:
        s = s + _roll_lanes(s, shift, interpret)
        shift *= 2
    w = (e / s).astype(q.dtype)                                 # [rows, fh]

    acc = jnp.zeros((f, dblk, c), jnp.float32)
    for j in range(f):
        ej = (lane_e == j * h + cc_e // hd).astype(w.dtype)     # [fh, c]
        wj = jnp.dot(w, ej, preferred_element_type=jnp.float32)  # [rows, c]
        acc = acc + wj.reshape(f, dblk, c) * v[j][None].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_dblk(d: int, c: int) -> int:
    cap = max(8, _DBLK_ELEM_CAP // c)
    dblk = 1
    while dblk * 2 <= cap and d % (dblk * 2) == 0:
        dblk *= 2
    return dblk


def _kernel_eligible(bf, d, c, n_frames, heads, dtype) -> bool:
    if n_frames * heads != 128:          # lane-packed logits layout
        return False
    if n_frames & (n_frames - 1):        # roll tree needs power of two
        return False
    if c % heads or (c // heads) % 8:    # hd must be sublane-aligned
        return False
    if bf % n_frames:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    return _pick_dblk(d, c) >= 8


def _temporal_attention_impl(q, k, v, n_frames, heads, scale, interpret,
                             compensate=None):
    bf, d, c = q.shape
    # interpret mode emulates the kernel on CPU but must respect the same
    # shape gate — the lane-roll softmax tree is silently wrong for
    # non-power-of-2 n_frames, eligible or not is not a backend question
    if not ((interpret or _on_tpu())
            and _kernel_eligible(bf, d, c, n_frames, heads, q.dtype)):
        return temporal_attention_reference(q, k, v, n_frames, heads, scale)
    if compensate is None:
        compensate = os.environ.get("NEURONS_TPU_TA_COMPENSATED") == "1"
    f, h = n_frames, heads
    hd = c // h
    b = bf // f
    dblk = _pick_dblk(d, c)
    q4 = q.reshape(b, f, d, c)
    k4 = k.reshape(b, f, d, c)
    v4 = v.reshape(b, f, d, c)
    spec = pl.BlockSpec((None, f, dblk, c), lambda bi, di: (bi, 0, di, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_temporal_kernel, f=f, h=h, hd=hd,
                          scale=scale, interpret=interpret,
                          compensate=compensate),
        grid=(b, d // dblk),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, f, d, c), q.dtype),
        interpret=interpret,
    )(q4, k4, v4)
    return out.reshape(bf, d, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def temporal_attention(q, k, v, n_frames: int, heads: int, scale: float,
                       interpret: bool = False):
    """Per-pixel cross-frame attention, q/k/v [(B F), D, C] -> same.

    Dispatches to the fused lane-packed Pallas kernel on TPU for the
    production motion-module shapes (F*H == 128), the einsum reference
    otherwise. Gradients always take the reference VJP (exact)."""
    return _temporal_attention_impl(q, k, v, n_frames, heads, scale,
                                    interpret)


def _ta_fwd(q, k, v, n_frames, heads, scale, interpret):
    out = _temporal_attention_impl(q, k, v, n_frames, heads, scale,
                                   interpret)
    return out, (q, k, v)


def _ta_bwd(n_frames, heads, scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b_, c_: temporal_attention_reference(
            a, b_, c_, n_frames, heads, scale), q, k, v)
    return vjp(g)


temporal_attention.defvjp(_ta_fwd, _ta_bwd)
