"""Stage-3 keyframe reconstruction (base + enhance modes).

TPU-native re-design of the reference stage-3 scripts
(reference recon_keyframe_neurons.py and recon_keyframe_neurons_enhance.py):

  voxel -> ridge/backbone -> 100-step prior `lax.scan` -> CLIP image tokens
       -> [enhance: classifier top-1 concept -> class-name text embed ->
           seg masks; masks gate VAE latents and modulate prior tokens]
       -> blurry video (recon head -> VAE decode)
       -> caption (GPT-2 greedy scan)
       -> keyframe (EulerEDM 38-step CFG unCLIP sampling -> VAE decode)

Everything after data loading is jitted; the unCLIP sampler and prior loop
are single `lax.scan` graphs. The reference loops per-sample in Python for
unclip_recon (recon_keyframe_neurons.py:429-494, batch 1 through a 38-step
sampler); here sampling is batched — the TPU-first win that amortizes the
UNet over the MXU.

Artifact contract — the reference's exact .pt files, so its stage-4/5
scripts (and the released EXP dump) interoperate with ours both ways:
  EXP/exp_{exp}/subj_{subj}/frames_generated{_enhance}/
    video_subj0{subj}_all_recons.pt / _all_gts.pt / recon_videos.pt /
    pred_test_caption_self.pt
(reference recon_keyframe_neurons.py:448-451) — written by pipelines/io.py.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neurons_tpu.config import SamplerConfig, UNet2DConfig
from neurons_tpu.diffusion import prior as prior_lib
from neurons_tpu.diffusion.denoiser import DiscreteDenoiser
from neurons_tpu.diffusion.samplers import sample_euler
from neurons_tpu.diffusion.schedule import sd_sigmas
from neurons_tpu.models.conditioner import unclip_vector_suffix


def unclip_sample(unet_apply: Callable, unet_params, vae_decode: Callable,
                  key: jax.Array, clip_tokens: jax.Array,
                  vector: Optional[jax.Array] = None,
                  num_steps: int = 38, cfg_scale: float = 5.0,
                  offset_noise_level: float = 0.04,
                  latent_hw: int = 96, scale_factor: float = 0.13025,
                  encoder_reuse: int = 1,
                  precompute_kv: Optional[Callable] = None,
                  tgate_step: int = 0, tgate_pab: int = 0,
                  pab: Optional[tuple] = None,
                  pab_range: Optional[tuple] = None,
                  deep_cache: int = 0) -> jax.Array:
    """The reference's `unclip_recon` (reference utils.py:302-350), batched.

    clip_tokens: [B, 256, 1664] CLIP image tokens (from the prior).
    Returns images in [0, 1], NCHW.

    Init math: z,noise ~ N(0,1); offset noise adds a per-sample scalar
    (reference utils.py:328-331); x0 = z + noise * sigma_0 (the divide by
    sqrt(1+sigma_0^2) at utils.py:333 cancels against the sampler's
    multiply at sampling.py:52, so we skip both: prepare=False).

    encoder_reuse > 1 enables Faster-Diffusion encoder propagation
    (PAPERS.md, arXiv 2312.09608): the UNet encoder runs on every
    `encoder_reuse`-th step and its features are reused in between —
    requires `unet_apply` to forward `cached`/`return_cache` kwargs to
    UNetModel. 1 (default) = exact sampling.

    precompute_kv(params, context) -> ctx_kv hoists each cross-attn site's
    K/V projection of the (step-invariant) CFG-doubled context out of the
    sampling scan (models.unet2d.precompute_context_kv) — EXACT, same
    numerics as the per-step projections.

    tgate_step > 0 enables TGATE cross-attn gating (PAPERS.md, arXiv
    2404.02747): steps >= tgate_step reuse the half-averaged cross-attn
    outputs captured at step tgate_step-1, which collapses the CFG pair
    into a single-batch UNet forward. Approximate; mutually exclusive with
    encoder_reuse > 1.
    """
    if tgate_step > 0 and encoder_reuse > 1:
        raise ValueError("tgate_step and encoder_reuse>1 are mutually "
                         "exclusive")
    if pab is not None and (tgate_step > 0 or encoder_reuse > 1):
        raise ValueError("pab is exclusive with tgate/encoder_reuse")
    if tgate_pab > 0 and tgate_step <= 0:
        raise ValueError("tgate_pab requires tgate_step > 0")
    if deep_cache > 1 and (tgate_step > 0 or encoder_reuse > 1
                           or pab is not None):
        raise ValueError("deep_cache is exclusive with "
                         "tgate/encoder_reuse/pab")
    b = clip_tokens.shape[0]
    k_z, k_noise, k_offset, k_uc = jax.random.split(key, 4)
    z = jax.random.normal(k_z, (b, 4, latent_hw, latent_hw))
    noise = jax.random.normal(k_noise, z.shape)
    if offset_noise_level > 0:
        noise = noise + offset_noise_level * jax.random.normal(
            k_offset, (b,))[:, None, None, None]

    sigmas = sd_sigmas(num_steps)
    x = z + noise * sigmas[0]

    if vector is None:
        vector = unclip_vector_suffix(b)
    uc_tokens = jax.random.normal(k_uc, clip_tokens.shape, clip_tokens.dtype)

    denoiser = DiscreteDenoiser.create_sd()

    def network(x, t_cond, crossattn, vector, **kw):
        return unet_apply(unet_params, x, t_cond, crossattn, vector, **kw)

    ctx2 = jnp.concatenate([uc_tokens, clip_tokens], axis=0)
    vec2 = jnp.concatenate([vector, vector], axis=0)
    kv2 = precompute_kv(unet_params, ctx2) if precompute_kv else None
    kv_kw = {} if kv2 is None else {"ctx_kv": kv2}

    def _precondition(x2, s2):
        idx = denoiser.sigma_to_idx(s2)
        sq = denoiser.sigmas[idx].reshape(-1, 1, 1, 1)
        c_skip, c_out, c_in, _ = denoiser.scaling(sq)
        return idx.astype(jnp.float32), c_in, c_out, c_skip

    def _combine(out, x2, c_out, c_skip):
        d = out * c_out + x2 * c_skip
        d_u, d_c = jnp.split(d, 2, axis=0)
        return d_u + cfg_scale * (d_c - d_u)

    def denoise_full(xs, s):
        x2 = jnp.concatenate([xs, xs], axis=0)
        s2 = jnp.concatenate([s, s], axis=0)
        t, c_in, c_out, c_skip = _precondition(x2, s2)
        out = network(x2 * c_in, t, ctx2, vec2, **kv_kw)
        return _combine(out, x2, c_out, c_skip)

    if tgate_step > 0:
        from neurons_tpu.diffusion.samplers import sample_euler_tgate

        def denoise_capture(xs, s):
            x2 = jnp.concatenate([xs, xs], axis=0)
            s2 = jnp.concatenate([s, s], axis=0)
            t, c_in, c_out, c_skip = _precondition(x2, s2)
            out, xattn = network(x2 * c_in, t, ctx2, vec2,
                                 capture_xattn=True, **kv_kw)
            # TGATE: cache the mean of the uncond/cond halves per site
            # ([depth, 2B, tq, ch] -> [depth, B, tq, ch])
            cache = jax.tree_util.tree_map(
                lambda a: 0.5 * (a[:, :b] + a[:, b:]), xattn)
            return _combine(out, x2, c_out, c_skip), cache

        def denoise_gated(xs, s, cache):
            t, c_in, c_out, c_skip = _precondition(xs, s)
            out = network(xs * c_in, t, clip_tokens, vector,
                          xattn_cached=cache)
            return out * c_out + xs * c_skip

        # TGATE x PAB (arXiv 2408.12588 over the gated phase): broadcast
        # the spatial self-attn residuals too, recomputing every
        # `tgate_pab`-th gated step
        def denoise_gated_capture(xs, s, cache):
            t, c_in, c_out, c_skip = _precondition(xs, s)
            out, sattn = network(xs * c_in, t, clip_tokens, vector,
                                 xattn_cached=cache, capture_sattn=True)
            return out * c_out + xs * c_skip, sattn

        def denoise_gated_reuse(xs, s, cache, sattn):
            t, c_in, c_out, c_skip = _precondition(xs, s)
            out = network(xs * c_in, t, clip_tokens, vector,
                          xattn_cached=cache, sattn_cached=sattn)
            return out * c_out + xs * c_skip

        samples_z = sample_euler_tgate(
            denoise_full, denoise_capture, denoise_gated, x, sigmas,
            tgate_step, prepare=False,
            denoise_gated_capture=denoise_gated_capture,
            denoise_gated_reuse=denoise_gated_reuse,
            gated_interval=tgate_pab)
    elif pab is not None:
        # Pyramid Attention Broadcast (arXiv 2408.12588) for the unCLIP
        # UNet: pab=(i_s, i_x) spatial/cross recompute intervals
        from neurons_tpu.diffusion.samplers import sample_euler_pab

        def denoise_pab(xs, s, caches, use_x, use_s):
            xattn, sattn = (None, None) if caches is None else caches
            x2 = jnp.concatenate([xs, xs], axis=0)
            s2 = jnp.concatenate([s, s], axis=0)
            t, c_in, c_out, c_skip = _precondition(x2, s2)
            kwargs = dict(kv_kw)
            kwargs["xattn_cached" if use_x else "capture_xattn"] = \
                xattn if use_x else True
            kwargs["sattn_cached" if use_s else "capture_sattn"] = \
                sattn if use_s else True
            out = network(x2 * c_in, t, ctx2, vec2, **kwargs)
            if isinstance(out, tuple):
                extras = list(out[1:])
                out = out[0]
            else:
                extras = []
            new_x = xattn if use_x else extras.pop(0)
            new_s = sattn if use_s else extras.pop(0)
            return _combine(out, x2, c_out, c_skip), (new_x, new_s)

        samples_z = sample_euler_pab(denoise_pab, x, sigmas, pab,
                                     pab_range=pab_range, prepare=False)
    elif deep_cache > 1:
        # DeepCache (arXiv 2312.00858): full UNet every `deep_cache`-th
        # step caches the level-0 up-path entry feature; in-between
        # steps recompute ONLY the shallow level-0 blocks (the depth-10
        # mid transformer and levels 1-2 are skipped). Same alternating
        # control flow as encoder reuse, different cache contents.
        from neurons_tpu.diffusion.samplers import \
            sample_euler_encoder_reuse

        def denoise_full_deep(xs, s):
            x2 = jnp.concatenate([xs, xs], axis=0)
            s2 = jnp.concatenate([s, s], axis=0)
            t, c_in, c_out, c_skip = _precondition(x2, s2)
            out, deep = network(x2 * c_in, t, ctx2, vec2,
                                return_deep_cache=True, **kv_kw)
            return _combine(out, x2, c_out, c_skip), deep

        def denoise_deep_cached(xs, s, deep):
            x2 = jnp.concatenate([xs, xs], axis=0)
            s2 = jnp.concatenate([s, s], axis=0)
            t, c_in, c_out, c_skip = _precondition(x2, s2)
            out = network(x2 * c_in, t, ctx2, vec2, deep_cached=deep,
                          **kv_kw)
            return _combine(out, x2, c_out, c_skip)

        samples_z = sample_euler_encoder_reuse(
            denoise_full_deep, denoise_deep_cached, x, sigmas, deep_cache,
            prepare=False)
    elif encoder_reuse <= 1:
        samples_z = sample_euler(denoise_full, x, sigmas, prepare=False)
    else:
        from neurons_tpu.diffusion.samplers import \
            sample_euler_encoder_reuse

        def denoise_full_cache(xs, s):
            x2 = jnp.concatenate([xs, xs], axis=0)
            s2 = jnp.concatenate([s, s], axis=0)
            t, c_in, c_out, c_skip = _precondition(x2, s2)
            out, cache = network(x2 * c_in, t, ctx2, vec2,
                                 return_cache=True, **kv_kw)
            return _combine(out, x2, c_out, c_skip), cache

        def denoise_cached(xs, s, cache):
            x2 = jnp.concatenate([xs, xs], axis=0)
            s2 = jnp.concatenate([s, s], axis=0)
            t, c_in, c_out, c_skip = _precondition(x2, s2)
            out = network(x2 * c_in, t, ctx2, vec2, cached=cache, **kv_kw)
            return _combine(out, x2, c_out, c_skip)

        samples_z = sample_euler_encoder_reuse(
            denoise_full_cache, denoise_cached, x, sigmas, encoder_reuse,
            prepare=False)
    # per-sample VAE decode for batch > 1: at 768x768 the decoder
    # activations are ~GBs per sample, so map over the batch instead of
    # decoding it at once (the reference also decodes sample-by-sample,
    # recon_keyframe_neurons.py:429-494); single-sample batches decode
    # directly (a lax.map wrapper costs ~0.5 s/clip of lost fusion)
    if b > 1:
        samples_x = jax.lax.map(
            lambda zi: vae_decode(zi[None])[0], samples_z / scale_factor)
    else:
        samples_x = vae_decode(samples_z / scale_factor)
    return jnp.clip(samples_x * 0.8 + 0.2, 0.0, 1.0)


class KeyframeOutputs(NamedTuple):
    prior_tokens: jax.Array        # [B, 256, 1664]
    motion_embeds: jax.Array       # [B, F, 256, 1664]
    keyframes: jax.Array           # [B, 3, 768, 768] in [0,1]
    blurry_latents: jax.Array      # [(B F), 4, h, w]
    captions: jax.Array            # [B, max_len] token ids
    cls_logits: Optional[jax.Array] = None   # enhance: [B, 51]
    seg_masks: Optional[jax.Array] = None    # enhance: [(B F), 1, h, w]


def reconstruct_keyframes(
    *, decoupler_apply: Callable, decoupler_params,
    unet_apply: Callable, unet_params, vae_decode: Callable,
    key: jax.Array, voxel: jax.Array,
    class_text_embeds: Optional[jax.Array] = None,
    sampler_cfg: SamplerConfig = SamplerConfig(),
    n_frames: int = 6, latent_hw: int = 96,
    scale_factor: float = 0.13025, enhance: bool = False,
    caption_len: int = 60, vae_latent_scale: float = 0.18215,
    mask_latent_hw: Optional[int] = None,
    prior_bias: Optional[jax.Array] = None,
    sampler_opts: Optional[dict] = None,
) -> KeyframeOutputs:
    """Full stage-3 forward for one batch. `decoupler_apply(params, method,
    *args, **kw)` dispatches NeuronsDecoupler methods; `class_text_embeds`
    is the precomputed [51, 1280] class-name CLIP table (enhance mode,
    reference recon_keyframe_neurons_enhance.py:377-402)."""
    from neurons_tpu.models.neurons import NeuronsDecoupler as ND

    if enhance and class_text_embeds is None:
        raise ValueError("enhance=True requires class_text_embeds "
                         "(the [51, 1280] class-name CLIP table)")
    k_prior, k_unclip = jax.random.split(key)
    b = voxel.shape[0]

    # ridge -> backbone (reference :359-360)
    _, clip_vision, _ = decoupler_apply(decoupler_params, ND.encode, voxel)

    # 100-step DDPM prior (reference :364-366)
    diffusion = prior_lib.PriorDiffusion.create(sampler_cfg.prior_steps)

    # prior_bias: step-invariant rel-pos bias precomputed by the caller
    # (models.prior.prior_attn_bias) and hoisted out of the 100-step scan
    def net_apply(p, image_embed, times, brain_embed, **kw):
        return decoupler_apply(p, ND.prior_apply, image_embed, times,
                               brain_embed, attn_bias=prior_bias, **kw)

    prior_out = prior_lib.p_sample_loop(
        diffusion, net_apply, decoupler_params, k_prior,
        clip_vision.shape, clip_vision)

    # motion embeddings + text projection (reference :370-374)
    motion = decoupler_apply(decoupler_params, ND.motion, prior_out)
    pooled_text = decoupler_apply(decoupler_params, ND.project_text,
                                  motion.mean(axis=1))

    cls_logits = None
    seg_masks = None
    flat_motion = motion.reshape(b * n_frames, motion.shape[2],
                                 motion.shape[3])
    if enhance:
        # classifier top-1 concept -> class text embed -> seg masks
        # (reference recon_keyframe_neurons_enhance.py:377-402)
        cls_logits = decoupler_apply(decoupler_params, ND.classify,
                                     motion.mean(axis=1).mean(axis=1))
        best = jnp.argmax(cls_logits, axis=-1)
        best_text = class_text_embeds[best]          # [B, 1280]
        seg_masks = decoupler_apply(decoupler_params, ND.seg_decode,
                                    flat_motion, best_text, b * n_frames)

    # blurry-video latents (reference :404-422)
    blurry = decoupler_apply(decoupler_params, ND.seg_decode, flat_motion,
                             pooled_text, b * n_frames, is_seg=False)
    if mask_latent_hw is not None:
        blurry = jax.image.resize(
            blurry, blurry.shape[:2] + (mask_latent_hw, mask_latent_hw),
            "nearest")
    gate = None
    if enhance and seg_masks is not None:
        # reference :411-413: sigmoid -> binarize > 0.5 -> map to {0.5, 1.0}
        gate = ((jax.nn.sigmoid(seg_masks) > 0.5).astype(blurry.dtype)
                + 1.0) / 2.0
        gate = jax.image.resize(gate, gate.shape[:2] + blurry.shape[-2:],
                                "nearest")
        blurry = blurry * gate                       # latent gating (:419)

    # caption (reference :429-442: prefix is the normalized clipproj vector)
    from neurons_tpu.training.losses import l2norm
    captions = decoupler_apply(decoupler_params, ND.caption_greedy,
                               l2norm(pooled_text), caption_len)

    # enhance: per-token modulation of the prior tokens before unCLIP
    # (reference :448-458): frame-mean mask -> 16x16 grid -> [B, N, 1] gate
    tokens = prior_out
    if enhance and gate is not None:
        n = prior_out.shape[1]
        grid = int(n ** 0.5)
        mask_video = gate.reshape(b, n_frames, *gate.shape[1:])
        image_mask = mask_video.mean(axis=1)         # [B, 1, h, w]
        image_mask = jax.image.resize(
            image_mask, (b, 1, grid, grid), "nearest")
        mask_emb = image_mask.reshape(b, n, 1)       # 'b c h w -> b (h w) c'
        tokens = tokens * mask_emb

    keyframes = unclip_sample(
        unet_apply, unet_params, vae_decode, k_unclip, tokens,
        num_steps=sampler_cfg.unclip_steps,
        cfg_scale=sampler_cfg.unclip_cfg_scale,
        offset_noise_level=sampler_cfg.offset_noise_level,
        latent_hw=latent_hw, scale_factor=scale_factor,
        **(sampler_opts or {}))

    return KeyframeOutputs(prior_tokens=prior_out, motion_embeds=motion,
                           keyframes=keyframes,
                           blurry_latents=blurry / vae_latent_scale,
                           captions=captions, cls_logits=cls_logits,
                           seg_masks=seg_masks)
