"""Stage-5 video reconstruction pipeline (NeuroClips sampler).

TPU-native re-design of the reference stage-5 path (reference
scripts/neuroclips_video{_enhance}.py + animatediff/pipelines/
pipeline_neuroclips.py:321-501):

  blurry 6-frame video --cccat--> 16 frames --VAE encode--> init latents
  keyframe --VAE encode--> sparse controlnet condition (frame 0)
  caption  --CLIP text--> prompt embeddings (CFG doubled with "")
  DDIM(25) loop: SparseCtrl residuals -> UNet3D eps -> CFG -> DDIM step
  frame-wise VAE decode -> video [B, F, 3, H, W] in [0, 1]

The whole 25-step loop is one `lax.scan`; CFG runs as a doubled batch.
Where the reference round-robins clips over DDP ranks
(scripts/neuroclips_video.py:39-40), here the batch axis shards over the
`data` mesh axis and frames can shard over `frame` (GSPMD, no rank logic).

Partial-noise init reproduced exactly (reference pipeline_neuroclips.py:
408-423): blurry latents are noised at timesteps[0] (t=961 for 25 steps)
and the loop runs all 25 steps — the blurry structure survives as the
low-frequency seed of the trajectory.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neurons_tpu.diffusion.ddim import DDIMScheduler


def cccat_interpolate(blurry: jax.Array, target_frames: int = 16
                      ) -> jax.Array:
    """6 -> 16 frame interpolation (reference scripts/neuroclips_video.py:
    49-58 `cccat`): insert two 2/3-1/3 blends between consecutive frames.
    blurry: [B, F0, C, H, W] -> [B, 3*(F0-1)+1, C, H, W]; the reference's
    16 comes from F0=6 -> 16."""
    b, f0 = blurry.shape[:2]
    outs = []
    for i in range(f0 - 1):
        a, bnext = blurry[:, i], blurry[:, i + 1]
        outs.append(a)
        outs.append(a * (2 / 3) + bnext * (1 / 3))
        outs.append(a * (1 / 3) + bnext * (2 / 3))
    outs.append(blurry[:, -1])
    out = jnp.stack(outs, axis=1)
    assert out.shape[1] == 3 * (f0 - 1) + 1
    if out.shape[1] != target_frames:
        idx = jnp.linspace(0, out.shape[1] - 1, target_frames).round(
        ).astype(jnp.int32)
        out = out[:, idx]
    return out


class VideoPipelineOutputs(NamedTuple):
    latents: jax.Array   # [B, 4, F, h, w]
    video: jax.Array     # [B, F, 3, H, W] in [0, 1]


def reconstruct_video(
    *, unet3d_apply: Callable, unet3d_params,
    controlnet_apply: Optional[Callable], controlnet_params,
    vae_encode_mode: Callable, vae_decode: Callable,
    key: jax.Array,
    blurry_video: jax.Array,        # [B, 6, 3, H, W] in [0, 1]
    keyframe: jax.Array,            # [B, 3, H, W] in [0, 1]
    text_embeddings: jax.Array,     # [B, 77, ctx] (conditional)
    uncond_embeddings: jax.Array,   # [B, 77, ctx] ("")
    num_steps: int = 25, guidance_scale: float = 8.5,
    low_strength: float = 0.3, n_frames: int = 16,
    controlnet_scale: float = 1.0, latent_scale: float = 0.18215,
    use_simplified_cond: bool = True, encoder_reuse: int = 1,
    tgate_step: int = 0, tgate_pab: int = 0,
    pab: Optional[Tuple[int, int, int]] = None,
    pab_range: Optional[Tuple[int, int]] = None,
) -> VideoPipelineOutputs:
    """One batched stage-5 reconstruction (reference
    scripts/neuroclips_video.py:243-330 per-clip loop, batched).

    tgate_step > 0 enables TGATE gating (PAPERS.md, arXiv 2404.02747):
    the CFG halves share the same latents, so freezing (half-averaging)
    the text cross-attn residuals and the controlnet residuals at step
    tgate_step-1 makes the halves identical — steps >= tgate_step run a
    single-batch UNet with the controlnet skipped. Approximate; mutually
    exclusive with encoder_reuse > 1.

    pab=(Is, It, Ic) enables Pyramid Attention Broadcast (PAPERS.md,
    arXiv 2408.12588): spatial self-attn recomputes every Is-th step,
    temporal every It-th, text cross-attn every Ic-th (Is | It | Ic —
    nested so each step recomputes a prefix of {spatial, temporal,
    cross}); in between, each site's cached attention RESIDUAL is
    broadcast. `pab_range=(start, end)` restricts broadcasting to the
    middle of the trajectory (full compute outside). Approximate;
    composable with neither tgate nor encoder_reuse."""
    if tgate_step > 0 and encoder_reuse > 1:
        raise ValueError("tgate_step and encoder_reuse>1 are mutually "
                         "exclusive")
    if pab is not None and (tgate_step > 0 or encoder_reuse > 1):
        raise ValueError("pab is exclusive with tgate/encoder_reuse")
    if tgate_pab > 0 and tgate_step <= 0:
        raise ValueError("tgate_pab requires tgate_step > 0")
    b = blurry_video.shape[0]
    sched = DDIMScheduler.create(num_steps)

    # --- init latents from interpolated blurry video (reference :265-270) ---
    motion = cccat_interpolate(blurry_video, n_frames)   # [B, F, 3, H, W]
    flat = motion.reshape(b * n_frames, *motion.shape[2:])
    lat = vae_encode_mode(2.0 * flat - 1.0) * latent_scale
    lat = lat.reshape(b, n_frames, *lat.shape[1:])
    latents = lat.transpose(0, 2, 1, 3, 4)               # [B, 4, F, h, w]

    # partial-noise init (reference pipeline_neuroclips.py:408-423).
    # NOTE: the reference's `timesteps[:t_start][:1]` is timesteps[0] for
    # every t_start >= 1, i.e. low_strength has no effect below ~0.96 —
    # reproduced faithfully; the clamp below only prevents the empty-slice
    # crash the reference would also hit at low_strength >= 1.
    init_timestep = min(int(num_steps * low_strength), num_steps)
    t_start = max(num_steps - init_timestep, 1)
    latent_timestep = sched.timesteps[:t_start][:1]
    noise = jax.random.normal(key, latents.shape, latents.dtype)
    latents = sched.add_noise(latents, noise,
                              jnp.broadcast_to(latent_timestep, (b,)))

    # --- controlnet condition: keyframe latent at frame 0 (reference
    # scripts/neuroclips_video.py:276-284, latent "simplified" mode) ---
    cond = None
    cond_mask = None
    if controlnet_apply is not None:
        if use_simplified_cond:
            key_lat = vae_encode_mode(2.0 * keyframe - 1.0) * latent_scale
            cond_frames = key_lat[:, :, None]             # [B, 4, 1, h, w]
        else:
            cond_frames = keyframe[:, :, None]
        ch, hh, ww = cond_frames.shape[1], cond_frames.shape[3], \
            cond_frames.shape[4]
        cond = jnp.zeros((b, ch, n_frames, hh, ww), latents.dtype)
        cond = cond.at[:, :, 0].set(cond_frames[:, :, 0])
        cond_mask = jnp.zeros((b, 1, n_frames, hh, ww), latents.dtype)
        cond_mask = cond_mask.at[:, :, 0].set(1.0)

    # --- CFG-doubled inputs ---
    text2 = jnp.concatenate([uncond_embeddings, text_embeddings], axis=0)
    if cond is not None:
        cond2 = jnp.concatenate([cond, cond], axis=0)
        mask2 = jnp.concatenate([cond_mask, cond_mask], axis=0)

    def _residuals(x2, t2):
        if controlnet_apply is None:
            return None, None
        return controlnet_apply(controlnet_params, x2, t2, text2, cond2,
                                mask2, controlnet_scale)

    if tgate_step > 0:
        bf = b * n_frames

        def _half_avg(a):
            # folded [(2B F), ...] rows are batch-major: first B*F = uncond
            if a is None:
                return None
            if a.ndim >= 2 and a.shape[0] == 2 * bf:
                return 0.5 * (a[:bf] + a[bf:])
            return 0.5 * (a[:, :bf] + a[:, bf:])  # stacked [depth, 2BF,...]

        def full_step(latents, t):
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.float32)
            down_res, mid_res = _residuals(x2, t2)
            eps = unet3d_apply(unet3d_params, x2, t2, text2, down_res,
                               mid_res)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            return eps_u + guidance_scale * (eps_c - eps_u)

        def capture_step(latents, t):
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.float32)
            down_res, mid_res = _residuals(x2, t2)
            eps, xattn = unet3d_apply(unet3d_params, x2, t2, text2,
                                      down_res, mid_res, capture_xattn=True)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            cache = (jax.tree_util.tree_map(_half_avg, xattn),
                     None if down_res is None else
                     tuple(_half_avg(r) for r in down_res),
                     _half_avg(mid_res))
            return eps, cache

        def gated_step(latents, t, cache):
            xattn, down_res, mid_res = cache
            t1 = jnp.full((b,), t, jnp.float32)
            return unet3d_apply(unet3d_params, latents, t1,
                                text_embeddings, down_res, mid_res,
                                xattn_cached=xattn)

        n = sched.timesteps.shape[0]
        m = min(max(int(tgate_step), 1), n)
        if m > 1:
            latents, _ = jax.lax.scan(
                lambda l, t: (sched.step(full_step(l, t), t, l), None),
                latents, sched.timesteps[:m - 1])
        eps, cache = capture_step(latents, sched.timesteps[m - 1])
        latents = sched.step(eps, sched.timesteps[m - 1], latents)
        if m < n and tgate_pab <= 1:
            latents, _ = jax.lax.scan(
                lambda l, t: (sched.step(gated_step(l, t, cache), t, l),
                              None),
                latents, sched.timesteps[m:])
        elif m < n:
            # TGATE x PAB composition: within the gated (single-batch,
            # controlnet-free) phase, also broadcast the spatial +
            # temporal attention residuals, recomputing every
            # `tgate_pab`-th gated step (arXiv 2408.12588 over the
            # arXiv 2404.02747 phase).
            xattn_c, down_res_c, mid_res_c = cache

            def gated_capture(latents, t):
                t1 = jnp.full((b,), t, jnp.float32)
                out = unet3d_apply(unet3d_params, latents, t1,
                                   text_embeddings, down_res_c, mid_res_c,
                                   xattn_cached=xattn_c,
                                   capture_sattn=True, capture_tattn=True)
                return out[0], (out[1], out[2])

            def gated_reuse(latents, t, st):
                sattn, tattn = st
                t1 = jnp.full((b,), t, jnp.float32)
                return unet3d_apply(unet3d_params, latents, t1,
                                    text_embeddings, down_res_c,
                                    mid_res_c, xattn_cached=xattn_c,
                                    sattn_cached=sattn,
                                    tattn_cached=tattn)

            st_shapes = jax.eval_shape(
                lambda l: gated_capture(l, sched.timesteps[m])[1], latents)
            st0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), st_shapes)

            def g_step(carry, args):
                latents, st = carry
                j, t = args
                eps, st = jax.lax.cond(
                    j % tgate_pab == 0,
                    lambda _: gated_capture(latents, t),
                    lambda _: (gated_reuse(latents, t, st), st),
                    None)
                return (sched.step(eps, t, latents), st), None

            (latents, _), _ = jax.lax.scan(
                g_step, (latents, st0),
                (jnp.arange(n - m), sched.timesteps[m:]))
    elif pab is not None:
        # Pyramid Attention Broadcast (arXiv 2408.12588): per-type
        # attention-residual reuse with nested recompute intervals.
        i_s, i_t, i_c = pab
        if not (i_t % i_s == 0 and i_c % i_t == 0):
            raise ValueError("pab intervals must nest: Is | It | Ic")
        n = sched.timesteps.shape[0]
        lo, hi = pab_range or (0, n)

        def run(latents, t, caches, use_x, use_s, use_t):
            xattn, sattn, tattn = caches
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.float32)
            down_res, mid_res = _residuals(x2, t2)
            kwargs = {}
            kwargs["xattn_cached" if use_x else "capture_xattn"] = \
                xattn if use_x else True
            kwargs["sattn_cached" if use_s else "capture_sattn"] = \
                sattn if use_s else True
            kwargs["tattn_cached" if use_t else "capture_tattn"] = \
                tattn if use_t else True
            out = unet3d_apply(unet3d_params, x2, t2, text2, down_res,
                               mid_res, **kwargs)
            if isinstance(out, tuple):
                eps, extras = out[0], list(out[1:])
            else:
                eps, extras = out, []
            new_x = xattn if use_x else extras.pop(0)
            new_s = sattn if use_s else extras.pop(0)
            new_t = tattn if use_t else extras.pop(0)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            return eps, (new_x, new_s, new_t)

        cache_shapes = jax.eval_shape(
            lambda l: run(l, sched.timesteps[0],
                          (None, None, None), False, False, False)[1],
            latents)
        caches0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)

        def step(carry, args):
            latents, caches = carry
            i, t = args
            full_pred = (i % i_c == 0) | (i < lo) | (i >= hi)

            eps, caches = jax.lax.cond(
                full_pred,
                lambda _: run(latents, t, caches, False, False, False),
                lambda _: jax.lax.cond(
                    i % i_t == 0,
                    lambda __: run(latents, t, caches, True, False, False),
                    lambda __: jax.lax.cond(
                        i % i_s == 0,
                        # spatial-only recompute: cross + temporal cached
                        lambda ___: run(latents, t, caches,
                                        True, False, True),
                        lambda ___: run(latents, t, caches,
                                        True, True, True),
                        None),
                    None),
                None)
            return (sched.step(eps, t, latents), caches), None

        (latents, _), _ = jax.lax.scan(
            step, (latents, caches0),
            (jnp.arange(n), sched.timesteps))
    elif encoder_reuse <= 1:
        def step(latents, t):
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.float32)
            down_res, mid_res = _residuals(x2, t2)
            eps = unet3d_apply(unet3d_params, x2, t2, text2, down_res,
                               mid_res)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            return sched.step(eps, t, latents), None

        latents, _ = jax.lax.scan(step, latents, sched.timesteps)
    else:
        # Faster-Diffusion encoder propagation (PAPERS.md, arXiv
        # 2312.09608): the UNet3D encoder features AND the controlnet
        # residuals recompute every `encoder_reuse`-th step only.
        def _full(latents, t):
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.float32)
            down_res, mid_res = _residuals(x2, t2)
            eps, cache = unet3d_apply(unet3d_params, x2, t2, text2,
                                      down_res, mid_res, return_cache=True)
            return eps, (cache, down_res, mid_res)

        def _reuse(latents, t, full_cache):
            cache, down_res, mid_res = full_cache
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.float32)
            return unet3d_apply(unet3d_params, x2, t2, text2, down_res,
                                mid_res, cached=cache)

        cache_shapes = jax.eval_shape(lambda l: _full(l, sched.timesteps[0])[1],
                                      latents)
        cache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)

        def step(carry, args):
            latents, cache = carry
            i, t = args

            def full(_):
                return _full(latents, t)

            def reuse(_):
                return _reuse(latents, t, cache), cache

            eps, cache = jax.lax.cond(i % encoder_reuse == 0, full, reuse,
                                      None)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            return (sched.step(eps, t, latents), cache), None

        (latents, _), _ = jax.lax.scan(
            step, (latents, cache0),
            (jnp.arange(sched.timesteps.shape[0]), sched.timesteps))

    # --- decode (reference pipeline_neuroclips.py:242-255 decodes
    # frame-by-frame; we map over frame chunks to bound decoder
    # activations while keeping the MXU fed) ---
    lat_f = latents.transpose(0, 2, 1, 3, 4).reshape(
        b * n_frames, *latents.shape[1:2] + latents.shape[3:])
    # chunk = the largest divisor of b*F that is <= 16, so the chunked
    # path ALWAYS applies (no silent whole-batch fallback that could OOM)
    n_total = b * n_frames
    chunk = next(c for c in range(min(16, n_total), 0, -1)
                 if n_total % c == 0)
    if n_total > chunk:
        lat_c = lat_f.reshape(n_total // chunk, chunk, *lat_f.shape[1:])
        frames = jax.lax.map(lambda z: vae_decode(z / latent_scale), lat_c)
        frames = frames.reshape(n_total, *frames.shape[2:])
    else:
        frames = vae_decode(lat_f / latent_scale)
    frames = jnp.clip(frames / 2 + 0.5, 0.0, 1.0)
    video = frames.reshape(b, n_frames, *frames.shape[1:])
    return VideoPipelineOutputs(latents=latents, video=video)


def animate(
    *, unet3d_apply: Callable, unet3d_params, vae_decode: Callable,
    key: jax.Array,
    text_embeddings: jax.Array, uncond_embeddings: jax.Array,
    n_frames: int = 16, latent_hw: int = 32, num_steps: int = 25,
    guidance_scale: float = 7.5, latent_scale: float = 0.18215,
) -> VideoPipelineOutputs:
    """Stock AnimateDiff text-to-video (reference animatediff/pipelines/
    pipeline_animation.py + scripts/animate.py demo): pure-noise DDIM with
    CFG, no blurry-latent init and no controlnet. The init noise is
    pre-scaled by sigma_init (diffusers init_noise_sigma == 1 for DDIM)."""
    b = text_embeddings.shape[0]
    sched = DDIMScheduler.create(num_steps)
    latents = jax.random.normal(key, (b, 4, n_frames, latent_hw, latent_hw))
    text2 = jnp.concatenate([uncond_embeddings, text_embeddings], axis=0)

    def step(latents, t):
        x2 = jnp.concatenate([latents, latents], axis=0)
        t2 = jnp.full((2 * b,), t, jnp.float32)
        eps = unet3d_apply(unet3d_params, x2, t2, text2, None, None)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        return sched.step(eps, t, latents), None

    latents, _ = jax.lax.scan(step, latents, sched.timesteps)
    lat_f = latents.transpose(0, 2, 1, 3, 4).reshape(
        b * n_frames, *latents.shape[1:2] + latents.shape[3:])
    frames = vae_decode(lat_f / latent_scale)
    frames = jnp.clip(frames / 2 + 0.5, 0.0, 1.0)
    video = frames.reshape(b, n_frames, *frames.shape[1:])
    return VideoPipelineOutputs(latents=latents, video=video)
