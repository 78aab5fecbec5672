"""Diffusion samplers as `lax.scan` loops (sgm-equivalent).

Re-derivation of reference generative_models/sgm/modules/diffusionmodules/
sampling.py: EulerEDM (the stage-3 unCLIP sampler, 38 steps with CFG 5.0,
reference recon_keyframe_neurons.py:244), plus Heun, EulerAncestral and
DPM++2M for sampler-zoo parity. Each step runs the denoiser on a
CFG-doubled batch (VanillaCFG, reference guiders.py:24-42) and the whole
ladder is one `lax.scan` — a single compiled graph instead of a Python loop
of kernel launches.

Convention (reference sampling.py:41-57): sigma ladders are descending with
a trailing 0, and the initial noise is multiplied by sqrt(1 + sigma_0^2)
inside `prepare` (callers like unclip_recon pre-divide by the same factor,
reference utils.py:333-335 — the two cancel into z + sigma_0 * noise).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

# denoise(x, sigma_batch) -> denoised x0 estimate  (cond is closed over)
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def make_cfg_denoiser(denoiser, network, cond: Dict, uc: Dict,
                      scale: float) -> DenoiseFn:
    """VanillaCFG: run [uncond ++ cond] in one doubled batch, combine
    x_u + scale * (x_c - x_u) (reference guiders.py:24-42)."""

    def denoise(x, sigma):
        x2 = jnp.concatenate([x, x], axis=0)
        s2 = jnp.concatenate([sigma, sigma], axis=0)
        c2 = {k: jnp.concatenate([uc[k], cond[k]], axis=0) for k in cond}
        out = denoiser(network, x2, s2, **c2)
        x_u, x_c = jnp.split(out, 2, axis=0)
        return x_u + scale * (x_c - x_u)

    return denoise


def make_identity_denoiser(denoiser, network, cond: Dict) -> DenoiseFn:
    def denoise(x, sigma):
        return denoiser(network, x, sigma, **cond)

    return denoise


def prepare_noise(x: jax.Array, sigmas: jax.Array) -> jax.Array:
    """reference sampling.py:52: x *= sqrt(1 + sigma_0^2)."""
    return x * jnp.sqrt(1.0 + sigmas[0] ** 2)


def _bshape(sigma, x):
    return jnp.full((x.shape[0],), sigma, x.dtype)


def sample_euler(denoise: DenoiseFn, x: jax.Array, sigmas: jax.Array,
                 s_churn: float = 0.0, s_noise: float = 1.0,
                 key: Optional[jax.Array] = None,
                 prepare: bool = True) -> jax.Array:
    """EulerEDMSampler (reference sampling.py:102-135,216-221). With
    s_churn=0 (the unclip6 setting) this is deterministic Euler:
      d = (x - D(x, sigma)) / sigma;  x <- x + (sigma_next - sigma) * d
    """
    if prepare:
        x = prepare_noise(x, sigmas)
    n = sigmas.shape[0] - 1
    gamma_max = min(s_churn / max(n, 1), 2 ** 0.5 - 1) if s_churn > 0 else 0.0

    def step(x, args):
        i, sigma, sigma_next = args
        if gamma_max > 0.0:
            gamma = jnp.where(sigma > 0, gamma_max, 0.0)
            sigma_hat = sigma * (gamma + 1.0)
            eps = jax.random.normal(jax.random.fold_in(key, i), x.shape,
                                    x.dtype) * s_noise
            x = x + eps * jnp.sqrt(jnp.maximum(
                sigma_hat ** 2 - sigma ** 2, 0.0))
        else:
            sigma_hat = sigma
        denoised = denoise(x, _bshape(sigma_hat, x))
        d = (x - denoised) / jnp.maximum(sigma_hat, 1e-9)
        return x + (sigma_next - sigma_hat) * d, None

    args = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, _ = jax.lax.scan(step, x, args)
    return x


def sample_heun(denoise: DenoiseFn, x: jax.Array, sigmas: jax.Array,
                prepare: bool = True) -> jax.Array:
    """HeunEDMSampler (reference sampling.py:138-164): Euler step then
    2nd-order correction when sigma_next > 0."""
    if prepare:
        x = prepare_noise(x, sigmas)

    def step(x, args):
        sigma, sigma_next = args
        denoised = denoise(x, _bshape(sigma, x))
        d = (x - denoised) / jnp.maximum(sigma, 1e-9)
        dt = sigma_next - sigma
        x_euler = x + dt * d

        def correct(xe):
            denoised2 = denoise(xe, _bshape(sigma_next, x))
            d2 = (xe - denoised2) / jnp.maximum(sigma_next, 1e-9)
            return x + dt * 0.5 * (d + d2)

        x_new = jax.lax.cond(sigma_next > 0, correct, lambda xe: xe, x_euler)
        return x_new, None

    x, _ = jax.lax.scan(step, x, (sigmas[:-1], sigmas[1:]))
    return x


def sample_euler_ancestral(denoise: DenoiseFn, x: jax.Array,
                           sigmas: jax.Array, key: jax.Array,
                           eta: float = 1.0, s_noise: float = 1.0,
                           prepare: bool = True) -> jax.Array:
    """EulerAncestralSampler (reference sampling.py:169-196)."""
    if prepare:
        x = prepare_noise(x, sigmas)
    n = sigmas.shape[0] - 1

    def step(x, args):
        i, sigma, sigma_next = args
        sigma_up = jnp.minimum(
            sigma_next,
            eta * jnp.sqrt(jnp.maximum(
                sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
                / jnp.maximum(sigma ** 2, 1e-12), 0.0)))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next ** 2 - sigma_up ** 2, 0.0))
        denoised = denoise(x, _bshape(sigma, x))
        d = (x - denoised) / jnp.maximum(sigma, 1e-9)
        x = x + (sigma_down - sigma) * d
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
        x = x + jnp.where(sigma_next > 0, noise * s_noise * sigma_up, 0.0)
        return x, None

    x, _ = jax.lax.scan(step, x, (jnp.arange(n), sigmas[:-1], sigmas[1:]))
    return x


def sample_dpmpp2m(denoise: DenoiseFn, x: jax.Array, sigmas: jax.Array,
                   prepare: bool = True) -> jax.Array:
    """DPM++(2M) (reference sampling.py:300-367): multistep in log-sigma
    space, carrying the previous denoised estimate."""
    if prepare:
        x = prepare_noise(x, sigmas)

    def t_of(sigma):
        return -jnp.log(jnp.maximum(sigma, 1e-10))

    n = sigmas.shape[0] - 1

    def step(carry, i):
        x, old_denoised = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
        denoised = denoise(x, _bshape(sigma, x))
        t, t_next = t_of(sigma), t_of(sigma_next)
        h = t_next - t
        h_last = t - t_of(sigma_prev)
        r = h_last / jnp.where(h == 0, 1.0, h)
        r_safe = jnp.where(jnp.abs(r) < 1e-9, 1.0, r)
        second_order = (1 + 1 / (2 * r_safe)) * denoised \
            - (1 / (2 * r_safe)) * old_denoised
        denoised_d = jnp.where((i > 0) & (jnp.abs(r) > 1e-9),
                               second_order, denoised)
        ratio = sigma_next / jnp.maximum(sigma, 1e-10)
        x_new = ratio * x - jnp.expm1(-h) * denoised_d
        # last step (sigma_next == 0) returns the denoised estimate
        x_new = jnp.where(sigma_next > 0, x_new, denoised)
        return (x_new, denoised), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), jnp.arange(n))
    return x


def sample_dpmpp2s_ancestral(denoise: DenoiseFn, x: jax.Array,
                             sigmas: jax.Array, key: jax.Array,
                             eta: float = 1.0, s_noise: float = 1.0,
                             prepare: bool = True) -> jax.Array:
    """DPM++(2S) ancestral (reference sampling.py:269-297): single-step
    2nd-order midpoint in log-sigma space + ancestral noise injection."""
    if prepare:
        x = prepare_noise(x, sigmas)
    n = sigmas.shape[0] - 1

    def t_of(sigma):
        return -jnp.log(jnp.maximum(sigma, 1e-10))

    def sigma_of(t):
        return jnp.exp(-t)

    def step(x, args):
        i, sigma, sigma_next = args
        sigma_up = jnp.minimum(
            sigma_next,
            eta * jnp.sqrt(jnp.maximum(
                sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
                / jnp.maximum(sigma ** 2, 1e-12), 0.0)))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next ** 2 - sigma_up ** 2,
                                          0.0))
        denoised = denoise(x, _bshape(sigma, x))

        def euler_to_zero(_):
            d = (x - denoised) / jnp.maximum(sigma, 1e-9)
            return x + (sigma_down - sigma) * d

        def midpoint(_):
            t, t_next = t_of(sigma), t_of(sigma_down)
            h = t_next - t
            s = t + 0.5 * h
            x2 = (sigma_of(s) / jnp.maximum(sigma, 1e-10)) * x \
                - jnp.expm1(-0.5 * h) * denoised
            denoised2 = denoise(x2, _bshape(sigma_of(s), x))
            return (sigma_of(t_next) / jnp.maximum(sigma, 1e-10)) * x \
                - jnp.expm1(-h) * denoised2

        x_new = jax.lax.cond(sigma_down > 1e-10, midpoint, euler_to_zero,
                             None)
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape,
                                  x.dtype)
        x_new = x_new + jnp.where(sigma_next > 0,
                                  noise * s_noise * sigma_up, 0.0)
        return x_new, None

    x, _ = jax.lax.scan(step, x, (jnp.arange(n), sigmas[:-1], sigmas[1:]))
    return x


def _lms_coefficients(sigmas, order: int):
    """Adams-Bashforth coefficients per step: integrated Lagrange basis
    over [sigma_i, sigma_{i+1}] (reference sampling.py:323-338 LinearMultistep
    via scipy quad; here a dense trapezoid on the STATIC host ladder)."""
    import numpy as np

    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    coeffs = np.zeros((n, order), np.float64)
    for i in range(n):
        cur = min(i + 1, order)
        ts = np.linspace(sig[i], sig[i + 1], 1025)
        for j in range(cur):
            prod = np.ones_like(ts)
            for k in range(cur):
                if k == j:
                    continue
                prod *= (ts - sig[i - k]) / (sig[i - j] - sig[i - k])
            coeffs[i, j] = np.trapezoid(prod, ts)
    return coeffs


def sample_lms(denoise: DenoiseFn, x: jax.Array, sigmas,
               order: int = 4, prepare: bool = True) -> jax.Array:
    """Linear multistep (reference sampling.py:318-345): Adams-Bashforth
    over the last `order` derivative estimates. `sigmas` must be a host
    (numpy) ladder — the coefficients are precomputed statically."""
    coeffs = jnp.asarray(_lms_coefficients(sigmas, order), x.dtype)
    sigmas = jnp.asarray(sigmas, x.dtype)
    if prepare:
        x = prepare_noise(x, sigmas)
    n = sigmas.shape[0] - 1

    def step(carry, i):
        x, ds = carry  # ds: [order, ...] newest-first derivative history
        sigma = sigmas[i]
        denoised = denoise(x, _bshape(sigma, x))
        d = (x - denoised) / jnp.maximum(sigma, 1e-9)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        upd = jnp.tensordot(coeffs[i], ds, axes=1)
        return (x + upd, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(step, (x, ds0), jnp.arange(n))
    return x


def make_linear_prediction_denoiser(denoiser, network, cond: Dict, uc: Dict,
                                    num_frames: int, min_scale: float = 1.0,
                                    max_scale: float = 2.5) -> DenoiseFn:
    """LinearPredictionGuider (reference guiders.py:49-99, SVD video CFG):
    per-frame guidance scale ramping linearly min->max over the clip.
    Expects the frame axis folded into batch as [(B F), ...]."""
    scales = jnp.linspace(min_scale, max_scale, num_frames)

    def denoise(x, sigma):
        x2 = jnp.concatenate([x, x], axis=0)
        s2 = jnp.concatenate([sigma, sigma], axis=0)
        c2 = {k: jnp.concatenate([uc[k], cond[k]], axis=0) for k in cond}
        out = denoiser(network, x2, s2, **c2)
        x_u, x_c = jnp.split(out, 2, axis=0)
        b = x_u.shape[0] // num_frames
        scale = jnp.tile(scales, b).reshape((-1,) + (1,) * (x_u.ndim - 1))
        return x_u + scale * (x_c - x_u)

    return denoise


def sample_euler_tgate(denoise_full: DenoiseFn, denoise_capture: Callable,
                       denoise_gated: Callable, x: jax.Array,
                       sigmas: jax.Array, gate_step: int,
                       prepare: bool = True,
                       denoise_gated_capture: Optional[Callable] = None,
                       denoise_gated_reuse: Optional[Callable] = None,
                       gated_interval: int = 0) -> jax.Array:
    """Euler with temporal cross-attention gating (TGATE, arXiv 2404.02747;
    PAPERS.md). CFG's cond/uncond branches share the latent x, so once the
    cross-attention outputs are frozen to a cached (half-averaged) value the
    two branches are *identical* — the gated phase runs a single-batch UNet
    with every cross-attn site skipped:

      steps [0, gate_step):   `denoise_full(x, s)` — normal CFG, 2B batch
      step  gate_step-1:      `denoise_capture(x, s) -> (denoised, cache)`
                              — also records each site's cross-attn output
      steps [gate_step, n):   `denoise_gated(x, s, cache)` — B batch,
                              cross-attn replaced by cache

    `gate_step` is static; gate_step >= n degenerates to exact Euler."""
    if prepare:
        x = prepare_noise(x, sigmas)
    n = sigmas.shape[0] - 1
    m = min(max(int(gate_step), 1), n)

    def euler(x, denoised, sigma, sigma_next):
        d = (x - denoised) / jnp.maximum(sigma, 1e-9)
        return x + (sigma_next - sigma) * d

    def step_full(x, args):
        sigma, sigma_next = args
        return euler(x, denoise_full(x, _bshape(sigma, x)), sigma,
                     sigma_next), None

    if m > 1:
        x, _ = jax.lax.scan(step_full, x, (sigmas[:m - 1], sigmas[1:m]))
    denoised, cache = denoise_capture(x, _bshape(sigmas[m - 1], x))
    x = euler(x, denoised, sigmas[m - 1], sigmas[m])

    if m >= n:
        return x
    if gated_interval <= 1 or denoise_gated_capture is None:
        def step_gated(x, args):
            sigma, sigma_next = args
            return euler(x, denoise_gated(x, _bshape(sigma, x), cache),
                         sigma, sigma_next), None

        x, _ = jax.lax.scan(step_gated, x, (sigmas[m:-1], sigmas[m + 1:]))
        return x

    # TGATE x PAB: broadcast further attention residuals within the gated
    # phase, recomputing every `gated_interval`-th gated step.
    # denoise_gated_capture(x, s, tgate_cache) -> (denoised, st_cache);
    # denoise_gated_reuse(x, s, tgate_cache, st_cache) -> denoised.
    st_shapes = jax.eval_shape(
        lambda xx: denoise_gated_capture(xx, _bshape(sigmas[m], xx),
                                         cache)[1], x)
    st0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 st_shapes)

    def step_gp(carry, args):
        x, st = carry
        j, sigma, sigma_next = args
        sb = _bshape(sigma, x)
        denoised, st = jax.lax.cond(
            j % gated_interval == 0,
            lambda _: denoise_gated_capture(x, sb, cache),
            lambda _: (denoise_gated_reuse(x, sb, cache, st), st),
            None)
        return (euler(x, denoised, sigma, sigma_next), st), None

    (x, _), _ = jax.lax.scan(
        step_gp, (x, st0),
        (jnp.arange(n - m), sigmas[m:-1], sigmas[m + 1:]))
    return x


def sample_euler_pab(denoise_pab: Callable, x: jax.Array,
                     sigmas: jax.Array, intervals,
                     pab_range=None, prepare: bool = True) -> jax.Array:
    """Euler with Pyramid Attention Broadcast (arXiv 2408.12588):
    `denoise_pab(x, sigma, caches, use_x, use_s) -> (denoised, caches)`
    computes (use_*=False) or reuses (True) the cross/spatial attention
    residual caches. intervals=(i_s, i_x) with i_s | i_x: spatial
    self-attn recomputes every i_s-th step, cross-attn every i_x-th;
    `pab_range=(lo, hi)` restricts broadcasting to those steps."""
    i_s, i_x = intervals
    if i_x % i_s != 0:
        raise ValueError("pab intervals must nest: i_s | i_x")
    if prepare:
        x = prepare_noise(x, sigmas)
    n = sigmas.shape[0] - 1
    lo, hi = pab_range or (0, n)

    cache_shapes = jax.eval_shape(
        lambda xx: denoise_pab(xx, _bshape(sigmas[0], xx), None,
                               False, False)[1], x)
    cache0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)

    def step(carry, args):
        x, caches = carry
        i, sigma, sigma_next = args
        sb = _bshape(sigma, x)
        full_pred = (i % i_x == 0) | (i < lo) | (i >= hi)
        denoised, caches = jax.lax.cond(
            full_pred,
            lambda _: denoise_pab(x, sb, caches, False, False),
            lambda _: jax.lax.cond(
                i % i_s == 0,
                lambda __: denoise_pab(x, sb, caches, True, False),
                lambda __: denoise_pab(x, sb, caches, True, True),
                None),
            None)
        d = (x - denoised) / jnp.maximum(sigma, 1e-9)
        return (x + (sigma_next - sigma) * d, caches), None

    (x, _), _ = jax.lax.scan(step, (x, cache0),
                             (jnp.arange(n), sigmas[:-1], sigmas[1:]))
    return x


def sample_euler_encoder_reuse(denoise_full: Callable,
                               denoise_cached: Callable,
                               x: jax.Array, sigmas: jax.Array,
                               reuse: int, prepare: bool = True
                               ) -> jax.Array:
    """Euler with encoder-feature propagation ("Faster Diffusion",
    arXiv 2312.09608; see PAPERS.md): `denoise_full(x, sigma) ->
    (denoised, cache)` runs the whole UNet; on non-key steps
    (i % reuse != 0) `denoise_cached(x, sigma, cache) -> denoised` reuses
    the cached encoder features and runs mid+decoder only. reuse=1 is
    exact Euler."""
    if prepare:
        x = prepare_noise(x, sigmas)
    n = sigmas.shape[0] - 1
    cache_shapes = jax.eval_shape(
        lambda xx: denoise_full(xx, _bshape(sigmas[0], xx))[1], x)
    cache0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)

    def step(carry, args):
        x, cache = carry
        i, sigma, sigma_next = args

        def full(_):
            return denoise_full(x, _bshape(sigma, x))

        def cached_step(_):
            return denoise_cached(x, _bshape(sigma, x), cache), cache

        denoised, cache_new = jax.lax.cond(i % reuse == 0, full,
                                           cached_step, None)
        d = (x - denoised) / jnp.maximum(sigma, 1e-9)
        return (x + (sigma_next - sigma) * d, cache_new), None

    (x, _), _ = jax.lax.scan(step, (x, cache0),
                             (jnp.arange(n), sigmas[:-1], sigmas[1:]))
    return x
