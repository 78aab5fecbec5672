"""Benchmark: end-to-end CC2017 clip reconstruction (stage 3 + stage 5).

Measures sec/clip for the full generative path at reference shapes
(BASELINE.md): 100-step diffusion prior over 256x1664 tokens -> 38-step
EulerEDM unCLIP at 4x96x96 latents with CFG 5.0 -> 768x768 keyframe decode
-> 16-frame 25-step DDIM AnimateDiff video with SparseCtrl at 4x32x32
latents -> 256x256 frame decode. Random weights (timing is
weight-independent), bf16 activations/params, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = (10 s north-star target) / measured — >1 beats the
BASELINE.json target of <10 s/clip (there are no published reference
numbers; BASELINE.json "published": {}).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_default_matmul_precision", "bfloat16")

import jax.numpy as jnp
import numpy as np

DTYPE = jnp.bfloat16


def _cast(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(DTYPE) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def build():
    from neurons_tpu.config import (BrainModelConfig, PriorConfig,
                                    SamplerConfig, UNet2DConfig,
                                    UNet3DConfig, VAEConfig)
    from neurons_tpu.models.prior import PriorNetwork
    from neurons_tpu.models.unet2d import UNetModel
    from neurons_tpu.models.unet3d import UNet3DModel
    from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
    from neurons_tpu.models.vae import AutoencoderKL

    key = jax.random.PRNGKey(0)
    scfg = SamplerConfig()

    # ---- prior (reference shapes: 256 tokens x 1664, depth 6) ----
    pcfg = PriorConfig()
    prior = PriorNetwork(pcfg)
    tok0 = jnp.zeros((1, pcfg.num_tokens, pcfg.dim), DTYPE)
    prior_params = _cast(prior.init(key, tok0, jnp.zeros((1,), jnp.int32),
                                    tok0)["params"])

    # ---- unCLIP UNet @ 96x96 latents ----
    ucfg = UNet2DConfig()
    unet2d = UNetModel(ucfg)
    x2 = jnp.zeros((1, 4, 96, 96), DTYPE)
    ctx = jnp.zeros((1, 256, 1664), DTYPE)
    vec = jnp.zeros((1, 1024), DTYPE)
    unet2d_params = _cast(unet2d.init(key, x2, jnp.zeros((1,)), ctx,
                                      vec)["params"])

    # ---- VAEs (SD f8) ----
    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    vae_params = _cast(vae.init(key, jnp.zeros((1, 3, 64, 64), DTYPE)))

    # ---- video UNet + SparseCtrl @ 32x32 latents, 16 frames ----
    u3cfg = UNet3DConfig()
    n_frames = scfg.n_video_frames
    unet3d = UNet3DModel(u3cfg, n_frames=n_frames)
    x3 = jnp.zeros((1, 4, n_frames, 32, 32), DTYPE)
    txt = jnp.zeros((1, 77, 768), DTYPE)
    unet3d_params = _cast(unet3d.init(key, x3, jnp.zeros((1,)), txt)["params"])
    cn = SparseControlNetModel(u3cfg, n_frames=n_frames)
    cn_params = _cast(cn.init(key, x3, jnp.zeros((1,)), txt,
                              jnp.zeros((1, 4, n_frames, 32, 32), DTYPE),
                              jnp.zeros((1, 1, n_frames, 32, 32), DTYPE)
                              )["params"])

    # ---------------- jitted stage functions ----------------
    from neurons_tpu.diffusion import prior as prior_lib
    from neurons_tpu.pipelines.keyframe import unclip_sample
    from neurons_tpu.pipelines.video import reconstruct_video

    diffusion = prior_lib.PriorDiffusion.create(scfg.prior_steps)

    enc_reuse = int(os.environ.get("BENCH_ENC_REUSE", "1"))
    tgate_step = int(os.environ.get("BENCH_TGATE", "0"))
    tgate_video = int(os.environ.get("BENCH_TGATE_VIDEO", "0"))
    # TGATE x PAB: broadcast spatial(/temporal) attention inside the
    # gated phase, recomputing every BENCH_TGATE_PAB-th gated step
    tgate_pab = int(os.environ.get("BENCH_TGATE_PAB", "0"))
    # Pyramid Attention Broadcast (arXiv 2408.12588): BENCH_PAB="2,4,8"
    # (spatial,temporal,cross intervals), BENCH_PAB_RANGE="2,23"
    pab = tuple(int(v) for v in os.environ["BENCH_PAB"].split(",")) \
        if os.environ.get("BENCH_PAB") else None
    pab_range = tuple(int(v) for v in
                      os.environ["BENCH_PAB_RANGE"].split(",")) \
        if os.environ.get("BENCH_PAB_RANGE") else None
    # stage-3 PAB: BENCH_PAB_KF="2,8" (spatial,cross intervals)
    pab_kf = tuple(int(v) for v in os.environ["BENCH_PAB_KF"].split(",")) \
        if os.environ.get("BENCH_PAB_KF") else None
    hoist_kv = os.environ.get("BENCH_HOIST_KV", "1") == "1"

    if hoist_kv:
        from neurons_tpu.models.unet2d import precompute_context_kv

        def kv_fn(p, ctx):
            return precompute_context_kv(p, ctx.astype(DTYPE), ucfg)
    else:
        kv_fn = None

    @jax.jit
    def stage3(prior_params, unet2d_params, vae_params, key, brain_tokens):
        # step-invariant rel-pos bias hoisted out of the 100-step scan
        from neurons_tpu.models.prior import prior_attn_bias
        bias = prior_attn_bias(prior_params, pcfg.num_tokens)

        def net_apply(p, image_embed, times, brain_embed, **kw):
            return prior.apply({"params": p}, image_embed.astype(DTYPE),
                               times, brain_embed.astype(DTYPE),
                               attn_bias=bias, **kw).astype(jnp.float32)

        k1, k2 = jax.random.split(key)
        prior_out = prior_lib.p_sample_loop(
            diffusion, net_apply, prior_params, k1,
            brain_tokens.shape, brain_tokens)

        def unet_apply(p, x, t, crossattn, vector, **kw):
            out = unet2d.apply({"params": p}, x.astype(DTYPE), t,
                               crossattn.astype(DTYPE),
                               vector.astype(DTYPE), **kw)
            if isinstance(out, tuple):
                return (out[0].astype(jnp.float32),) + out[1:]
            return out.astype(jnp.float32)

        def vae_decode(z):
            return vae.apply(vae_params, z.astype(DTYPE),
                             method="decode").astype(jnp.float32)

        return unclip_sample(unet_apply, unet2d_params, vae_decode, k2,
                             prior_out, num_steps=scfg.unclip_steps,
                             cfg_scale=scfg.unclip_cfg_scale,
                             latent_hw=96,
                             encoder_reuse=enc_reuse,
                             precompute_kv=kv_fn,
                             tgate_step=tgate_step,
                             tgate_pab=tgate_pab,
                             pab=pab_kf,
                             pab_range=pab_range), prior_out

    @jax.jit
    def stage5(unet3d_params, cn_params, vae_params, key, blurry, keyframe,
               text_emb):
        def u3(p, x, t, ctx, down, mid, **kw):
            out = unet3d.apply({"params": p}, x.astype(DTYPE), t,
                               ctx.astype(DTYPE), down, mid, **kw)
            if isinstance(out, tuple):
                return (out[0].astype(jnp.float32),) + out[1:]
            return out.astype(jnp.float32)

        def cna(p, x, t, ctx, cond, mask, scale):
            return cn.apply({"params": p}, x.astype(DTYPE), t,
                            ctx.astype(DTYPE), cond.astype(DTYPE),
                            mask.astype(DTYPE), scale)

        return reconstruct_video(
            unet3d_apply=u3, unet3d_params=unet3d_params,
            controlnet_apply=cna, controlnet_params=cn_params,
            vae_encode_mode=lambda x: vae.apply(
                vae_params, x.astype(DTYPE), method="encode").mode(
                ).astype(jnp.float32),
            vae_decode=lambda z: vae.apply(
                vae_params, z.astype(DTYPE),
                method="decode").astype(jnp.float32),
            key=key, blurry_video=blurry, keyframe=keyframe,
            text_embeddings=text_emb,
            uncond_embeddings=jnp.zeros_like(text_emb),
            num_steps=scfg.video_steps,
            guidance_scale=scfg.video_cfg_scale,
            low_strength=scfg.low_strength,
            n_frames=n_frames, encoder_reuse=enc_reuse,
            tgate_step=tgate_video, tgate_pab=tgate_pab, pab=pab,
            pab_range=pab_range).video

    params = dict(prior=prior_params, unet2d=unet2d_params, vae=vae_params,
                  unet3d=unet3d_params, cn=cn_params)
    return stage3, stage5, params


def run_once(stage3, stage5, params, key, batch):
    """One batched pass: `batch` clips amortize the fixed sampler
    overheads exactly as the reference batches stage 3 (batch 20,
    reference recon_keyframe_neurons.py:350)."""
    verbose = os.environ.get("BENCH_VERBOSE") == "1"
    brain_tokens = jax.random.normal(key, (batch, 256, 1664)) * 0.5
    t0 = time.perf_counter()
    kf, prior_out = stage3(params["prior"], params["unet2d"], params["vae"],
                           key, brain_tokens)
    if verbose:
        float(jnp.sum(kf))  # host-scalar sync (see stage-5 note)
        print(f"  stage3: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    keyframe = jax.image.resize(kf, (batch, 3, 256, 256), "linear")
    blurry = jax.random.uniform(key, (batch, 6, 3, 256, 256))
    text = jax.random.normal(key, (batch, 77, 768)) * 0.1
    t1 = time.perf_counter()
    video = stage5(params["unet3d"], params["cn"], params["vae"], key,
                   blurry, keyframe, text)
    # sync by materializing a scalar on the host: block_until_ready over
    # the axon tunnel has been observed to return early (0.006 s/clip
    # readings); a host float of a reduction cannot complete before the
    # computation does
    checksum = float(jnp.sum(video))
    assert np.isfinite(checksum), f"non-finite video (checksum {checksum})"
    if verbose:
        print(f"  stage5: {time.perf_counter() - t1:.2f}s", file=sys.stderr)
    return video


def main():
    stage3, stage5, params = build()
    key = jax.random.PRNGKey(0)
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    # warmup / compile
    run_once(stage3, stage5, params, key, batch)
    n_iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    for i in range(n_iters):
        run_once(stage3, stage5, params, jax.random.PRNGKey(i + 1), batch)
    sec_per_clip = (time.perf_counter() - t0) / (n_iters * batch)
    print(json.dumps({
        "metric": "sec_per_clip_e2e_stage3+5",
        "value": round(sec_per_clip, 3),
        "unit": "s/clip",
        "vs_baseline": round(10.0 / sec_per_clip, 3),
    }))


if __name__ == "__main__":
    main()
