"""Trajectory-deviation proxy for the approximate fast paths.

Builds the bench stage-5 models with random weights at (optionally
reduced) reference shapes, runs the EXACT sampler and a fast path from
the same seed, and reports rms relative deviation + correlation of the
final latents. This is the methodology behind CLAUDE.md's fast-path
quality notes (TGATE 3% rms / corr 0.9995; encoder-reuse 49% rms) —
a random-weight proxy, not a substitute for validation on real weights.

Usage (TPU or CPU):
  python tools/fastpath_proxy.py tgate=10
  python tools/fastpath_proxy.py pab=2,4,8
  python tools/fastpath_proxy.py pab=2,4,8 pab_range=1,20 hw=16 frames=8
  python tools/fastpath_proxy.py enc_reuse=2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from neurons_tpu.utils import compile_cache  # noqa: E402
compile_cache.setup("tpu")
# the axon plugin re-pins JAX_PLATFORMS at interpreter startup; force the
# requested platform through jax.config (wins until backend init)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(argv):
    opts = dict(a.split("=", 1) for a in argv)
    if opts.get("stage") == "3":
        return main_stage3(opts)
    hw = int(opts.get("hw", "32"))
    frames = int(opts.get("frames", "16"))
    steps = int(opts.get("steps", "25"))
    # validate fast-path flags BEFORE the expensive model build/compile
    fast_kwargs, label = _fast_kwargs(opts)

    from neurons_tpu.config import SamplerConfig, UNet3DConfig
    from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
    from neurons_tpu.models.unet3d import UNet3DModel
    from neurons_tpu.pipelines.video import reconstruct_video

    if opts.get("tiny") == "1":
        cfg = UNet3DConfig(block_out_channels=(16, 32),
                           down_block_types=("CrossAttnDownBlock3D",
                                             "DownBlock3D"),
                           up_block_types=("UpBlock3D",
                                           "CrossAttnUpBlock3D"),
                           layers_per_block=1, cross_attention_dim=16,
                           attention_head_dim=8, norm_num_groups=8,
                           motion_num_attention_heads=2)
    else:
        cfg = UNet3DConfig()
    key = jax.random.PRNGKey(0)
    unet = UNet3DModel(cfg, n_frames=frames)
    x0 = jnp.zeros((1, 4, frames, hw, hw))
    txt0 = jnp.zeros((1, 77, cfg.cross_attention_dim))
    uparams = unet.init(key, x0, jnp.zeros((1,)), txt0)
    # conv_out and the motion proj_outs are ZERO-init (reference parity);
    # randomize them so the random-weight model actually produces signal
    # (otherwise eps == 0 and every path trivially matches)
    uparams = {"params": dict(uparams["params"])}
    uparams["params"]["conv_out"] = {
        "kernel": jax.random.normal(
            jax.random.PRNGKey(7),
            uparams["params"]["conv_out"]["kernel"].shape) * 0.05,
        "bias": uparams["params"]["conv_out"]["bias"]}
    for name, sub in uparams["params"].items():
        if "motion" in name and "proj_out" in sub:
            sub["proj_out"] = {
                "kernel": jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(8), hash(name) % (2**31)),
                    sub["proj_out"]["kernel"].shape) * 0.05,
                "bias": sub["proj_out"]["bias"]}
    cn = SparseControlNetModel(cfg, n_frames=frames)
    cparams = cn.init(jax.random.PRNGKey(1), x0, jnp.zeros((1,)), txt0,
                      x0, jnp.zeros((1, 1, frames, hw, hw)))

    def pool_encode(x):
        # stand-in VAE encoder: 8x avg-pool to latent resolution + 4 ch
        n, c, h, w = x.shape
        p = x.reshape(n, c, h // 8, 8, w // 8, 8).mean(axis=(3, 5))
        return jnp.concatenate([p, p[:, :1]], axis=1) - 0.5

    common = dict(
        unet3d_apply=lambda p, x, t, c, d, m, **k:
            unet.apply(p, x, t, c, d, m, **k),
        unet3d_params=uparams,
        controlnet_apply=lambda p, x, t, c, cond, mask, s:
            cn.apply(p, x, t, c, cond, mask, s),
        controlnet_params=cparams,
        vae_encode_mode=pool_encode,
        vae_decode=lambda z: jnp.zeros((z.shape[0], 3, hw * 8, hw * 8)),
        key=jax.random.PRNGKey(2),
        blurry_video=jax.random.uniform(jax.random.PRNGKey(3),
                                        (1, 6, 3, hw * 8, hw * 8)),
        keyframe=jax.random.uniform(jax.random.PRNGKey(4),
                                    (1, 3, hw * 8, hw * 8)),
        text_embeddings=jax.random.normal(
            jax.random.PRNGKey(5), (1, 77, cfg.cross_attention_dim)) * 0.1,
        uncond_embeddings=jnp.zeros((1, 77, cfg.cross_attention_dim)),
        num_steps=steps, n_frames=frames)

    base = np.asarray(reconstruct_video(**common).latents, np.float32)
    fast = np.asarray(reconstruct_video(**common, **fast_kwargs).latents,
                      np.float32)
    diff = fast - base
    rms = float(np.sqrt((diff ** 2).mean()) / np.sqrt((base ** 2).mean()))
    corr = float(np.corrcoef(base.ravel(), fast.ravel())[0, 1])
    print(f"{label}: rms_rel={rms:.4f} corr={corr:.5f} "
          f"(hw={hw} frames={frames} steps={steps})")


def _fast_kwargs(opts):
    fast_kwargs = {}
    label = []
    if "tgate" in opts:
        fast_kwargs["tgate_step"] = int(opts["tgate"])
        label.append(f"tgate={opts['tgate']}")
        if "tgate_pab" in opts:
            fast_kwargs["tgate_pab"] = int(opts["tgate_pab"])
            label.append(f"tgate_pab={opts['tgate_pab']}")
    if "enc_reuse" in opts:
        fast_kwargs["encoder_reuse"] = int(opts["enc_reuse"])
        label.append(f"enc_reuse={opts['enc_reuse']}")
    if "pab" in opts:
        fast_kwargs["pab"] = tuple(int(v) for v in opts["pab"].split(","))
        label.append(f"pab={opts['pab']}")
        if "pab_range" in opts:
            fast_kwargs["pab_range"] = tuple(
                int(v) for v in opts["pab_range"].split(","))
            label.append(f"range={opts['pab_range']}")
    if "deep_cache" in opts:
        if opts.get("stage") != "3":
            # only the stage-3 unCLIP sampler implements DeepCache;
            # fail before the expensive exact baseline runs
            raise SystemExit("deep_cache= requires stage=3")
        fast_kwargs["deep_cache"] = int(opts["deep_cache"])
        label.append(f"deep_cache={opts['deep_cache']}")
    if not fast_kwargs:
        raise SystemExit("pass one of tgate= / enc_reuse= / pab= / "
                         "deep_cache=")
    return fast_kwargs, " ".join(label)


def main_stage3(opts):
    """Keyframe (unCLIP) trajectory proxy: exact vs tgate/pab/enc_reuse.
    Usage: stage=3 pab=2,8 [hw=96 steps=38 tiny=1]."""
    hw = int(opts.get("hw", "96"))
    steps = int(opts.get("steps", "38"))

    from neurons_tpu.config import UNet2DConfig
    from neurons_tpu.models.unet2d import UNetModel, cross_attn_sites
    from neurons_tpu.pipelines.keyframe import unclip_sample

    if opts.get("tiny") == "1":
        cfg = UNet2DConfig(model_channels=16, channel_mult=(1, 2),
                           num_res_blocks=1, attention_resolutions=(2,),
                           transformer_depth=(1, 1), num_head_channels=8,
                           context_dim=16, adm_in_channels=8)
    else:
        cfg = UNet2DConfig()
    m = UNetModel(cfg)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 4, hw, hw)), jnp.zeros((1,)),
                    jnp.zeros((1, 8, cfg.context_dim)),
                    jnp.zeros((1, cfg.adm_in_channels)))["params"]
    # randomize zero-init heads so the random-weight model has signal
    params = jax.tree_util.tree_map(lambda x: x, params)
    for i, (name, _) in enumerate(cross_attn_sites(cfg)):
        po = params[name]["proj_out"]
        po["kernel"] = jax.random.normal(jax.random.PRNGKey(100 + i),
                                         po["kernel"].shape) * 0.1
    oc = params["out_conv"]
    oc["kernel"] = jax.random.normal(jax.random.PRNGKey(99),
                                     oc["kernel"].shape) * 0.05

    def unet_apply(p, x, t, ctx, vec, **kw):
        return m.apply({"params": p}, x, t, ctx, vec, **kw)

    tokens = jax.random.normal(jax.random.PRNGKey(1),
                               (1, 256 if opts.get("tiny") != "1" else 8,
                                cfg.context_dim)) * 0.3
    vec = jnp.zeros((1, cfg.adm_in_channels))
    common = dict(num_steps=steps, latent_hw=hw)
    ident = lambda z: z

    fast_kwargs, label = _fast_kwargs(opts)
    label = "stage3 " + label

    base = np.asarray(unclip_sample(unet_apply, params, ident,
                                    jax.random.PRNGKey(5), tokens, vec,
                                    **common), np.float32)
    fast = np.asarray(unclip_sample(unet_apply, params, ident,
                                    jax.random.PRNGKey(5), tokens, vec,
                                    **common, **fast_kwargs), np.float32)
    diff = fast - base
    rms = float(np.sqrt((diff ** 2).mean()) / np.sqrt((base ** 2).mean()))
    corr = float(np.corrcoef(base.ravel(), fast.ravel())[0, 1])
    print(f"{label}: rms_rel={rms:.4f} corr={corr:.5f} "
          f"(hw={hw} steps={steps})")


if __name__ == "__main__":
    main(sys.argv[1:])
