"""Engine assembly from real external checkpoints.

One call per reference weight bundle, mirroring the reference's loading
flows so a user can point the CLI at the same downloaded files
(reference README.md:31-99):

  * unclip6 Lightning ckpt         -> stage-3 UNet + VAE (+EMA swap)
    (reference recon_keyframe_neurons.py:243-323)
  * SD-1.5 / DreamBooth LDM ckpt
    + AnimateDiff motion module
    + domain-adapter LoRA          -> stage-5 UNet3D
    (reference animatediff/utils/util.py:92-185, configs/NeuroClips/
    control.yaml:1-23)
  * SparseCtrl ckpt                -> stage-5 controlnet
  * brain_model_prior_last.pth     -> handled by utils.checkpoint (ours)

Everything is host-side numpy; callers move params onto the mesh with
their chosen shardings.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

from neurons_tpu.interop import convert_ldm, torch_import as TI


def _torch_load(path: str) -> Dict:
    import torch

    if path.endswith(".safetensors"):
        # minimal safetensors reader (host): torch ships no loader for it
        # without the safetensors package, which IS available in this env
        from safetensors.torch import load_file
        return load_file(path)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    return sd.get("state_dict", sd)


def load_unclip_engine(ckpt_path: str, unet_cfg, vae_cfg,
                       use_ema: bool = True) -> Tuple[Dict, Dict, Dict]:
    """unclip6_epoch0_step110000.ckpt -> (unet2d params, vae params,
    report). EMA shadow weights replace the live UNet weights first (the
    reference samples inside `ema_scope`, utils.py:307)."""
    sd = _torch_load(ckpt_path)
    report: Dict[str, Any] = {}
    if use_ema:
        sd, report["ema_swapped"] = TI.ldm_apply_ema(sd)
    unet_sd = TI.strip_prefix(sd, "model.diffusion_model.")
    unet_params, report["unet_unused"] = TI.import_ldm_unet(unet_sd, unet_cfg)
    vae_sd = TI.strip_prefix(sd, "first_stage_model.")
    vae_params, report["vae_unused"] = TI.import_ldm_vae(vae_sd, vae_cfg)
    return unet_params, vae_params, report


def load_animatediff_unet3d(base_ckpt_path: str, motion_module_path: str,
                            cfg,
                            lora_path: Optional[str] = None,
                            lora_alpha: float = 0.8,
                            dreambooth_path: Optional[str] = None
                            ) -> Tuple[Dict, Dict]:
    """Assemble stage-5 UNet3D params the way the reference's
    `load_weights` does (util.py:92-185): SD-1.5 base (or DreamBooth
    override) -> LDM->diffusers conversion -> LoRA merge -> spatial
    import -> motion-module merge."""
    report: Dict[str, Any] = {}
    sd = _torch_load(dreambooth_path or base_ckpt_path)
    if any(k.startswith("model.diffusion_model.") for k in sd):
        sd = TI.strip_prefix(sd, "model.diffusion_model.")
    if any(k.startswith("input_blocks.") for k in sd) or \
            "time_embed.0.weight" in sd:
        sd = convert_ldm.convert_ldm_unet_to_diffusers(sd)
    if lora_path:
        lora_sd = _torch_load(lora_path)
        sd, report["lora_unmatched"] = convert_ldm.merge_lora_into_state_dict(
            sd, lora_sd, alpha=lora_alpha, prefix="lora_unet")
    params, report["spatial_unused"] = TI.import_animatediff_unet3d(sd, cfg)
    mm_sd = TI.filter_motion_module(_torch_load(motion_module_path))
    params, report["motion_unused"] = TI.import_motion_modules(
        mm_sd, cfg, params)
    return params, report


def load_sd_vae(ckpt_path: str, cfg) -> Tuple[Dict, Dict]:
    """SD-1.5 first-stage VAE (LDM keys under `first_stage_model.` or a
    standalone diffusers dump) -> AutoencoderKL params."""
    sd = _torch_load(ckpt_path)
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = TI.strip_prefix(sd, "first_stage_model.")
    if "encoder.down.0.block.0.norm1.weight" in sd:  # LDM layout
        sd = convert_ldm.convert_ldm_vae_to_diffusers(sd)
    params, unused = TI.import_diffusers_vae(
        sd, num_blocks=len(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block)
    return params, {"vae_unused": unused}


def load_sd_text_encoder(ckpt_path: str, layers: int) -> Tuple[Dict, Dict]:
    """SD-1.5 CLIP text tower (`cond_stage_model.transformer.` HF layout)
    -> CLIPTextTower params."""
    sd = _torch_load(ckpt_path)
    for prefix in ("cond_stage_model.transformer.",
                   "text_encoder.", "cond_stage_model.model."):
        if any(k.startswith(prefix) for k in sd):
            sd = TI.strip_prefix(sd, prefix)
            break
    params, unused = TI.import_hf_clip_text(sd, layers)
    return params, {"text_unused": unused}


def load_sparse_controlnet(ckpt_path: str, cfg) -> Tuple[Dict, Dict]:
    sd = _torch_load(ckpt_path)
    if any(k.startswith("controlnet.") for k in sd):
        sd = TI.strip_prefix(sd, "controlnet.")
    params, unused = TI.import_sparse_controlnet(sd, cfg)
    return params, {"controlnet_unused": unused}


def load_svd(ckpt_path: str, unet_cfg, dec_cfg,
             vae_cfg=None) -> Tuple[Dict, Dict, Dict, Dict]:
    """SVD checkpoint -> (video-unet params, temporal-decoder params,
    vae-encoder params, report). The SVD safetensors/Lightning file uses
    the sgm layout: `model.diffusion_model.` VideoUNet (reference
    video_model.py:84-493), `first_stage_model.` AutoencodingEngine with
    an sgm Encoder and the temporal VideoDecoder (reference
    configs/inference/svd.yaml first_stage_config). vae_cfg defaults to
    dec_cfg.vae; the encoder import reuses the LDM VAE key scheme (encoder
    half only)."""
    sd = _torch_load(ckpt_path)
    report: Dict[str, Any] = {}
    if any(k.startswith("conditioner.") for k in sd):
        # conditioner CLIP/VAE towers are loaded separately
        report["conditioner_keys_skipped"] = sum(
            1 for k in sd if k.startswith("conditioner."))
    unet_sd = TI.strip_prefix(sd, "model.diffusion_model.")
    unet_params, report["unet_unused"] = TI.import_svd_unet(unet_sd,
                                                            unet_cfg)
    fs = TI.strip_prefix(sd, "first_stage_model.")
    dec_sd = TI.strip_prefix(fs, "decoder.")
    dec_params, report["decoder_unused"] = TI.import_video_decoder(
        dec_sd, dec_cfg)
    vae_cfg = vae_cfg or dec_cfg.vae
    enc_params: Dict[str, Any] = {}
    if any(k.startswith("encoder.") for k in fs):
        enc_sd = TI.strip_prefix(fs, "encoder.")
        enc_params, report["encoder_unused"] = _import_vae_encoder(
            enc_sd, vae_cfg)
    return unet_params, dec_params, enc_params, report


def _import_vae_encoder(sd: Dict, cfg) -> Tuple[Dict, list]:
    """Encoder half of the sgm VAE layout (model.py Encoder — same key
    scheme import_ldm_vae maps under 'encoder.')."""
    tr = TI._Tracker(dict(sd))

    def resnet(prefix):
        r = {"norm1": TI.norm(tr, f"{prefix}.norm1"),
             "conv1": TI.conv(tr, f"{prefix}.conv1"),
             "norm2": TI.norm(tr, f"{prefix}.norm2"),
             "conv2": TI.conv(tr, f"{prefix}.conv2")}
        if f"{prefix}.nin_shortcut.weight" in tr:
            r["nin_shortcut"] = TI.conv(tr, f"{prefix}.nin_shortcut")
        return r

    p: Dict[str, Any] = {
        "conv_in": TI.conv(tr, "conv_in"),
        "norm_out": TI.norm(tr, "norm_out"),
        "conv_out": TI.conv(tr, "conv_out"),
        "mid_block_1": resnet("mid.block_1"),
        "mid_attn": {"norm": TI.norm(tr, "mid.attn_1.norm"),
                     "q": TI._lin_or_1x1(tr, "mid.attn_1.q"),
                     "k": TI._lin_or_1x1(tr, "mid.attn_1.k"),
                     "v": TI._lin_or_1x1(tr, "mid.attn_1.v"),
                     "proj_out": TI._lin_or_1x1(tr, "mid.attn_1.proj_out")},
        "mid_block_2": resnet("mid.block_2"),
    }
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_block_{j}"] = resnet(f"down.{i}.block.{j}")
        if f"down.{i}.downsample.conv.weight" in tr:
            p[f"down_{i}_downsample"] = {
                "conv": TI.conv(tr, f"down.{i}.downsample.conv")}
    return p, tr.unused()
