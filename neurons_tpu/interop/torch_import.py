"""PyTorch -> flax checkpoint importers.

Covers the foreign checkpoint formats of the reference pipeline
(SURVEY.md section 5 checkpoint/resume):
  * HF GPT-2 ("gpt2")                 -> models.gpt2.TextDecoder LM
  * HF CLIP (openai/clip-vit-*)       -> models.clip towers
  * diffusers AutoencoderKL (SD-1.5)  -> models.vae.AutoencoderKL
  * LDM/sgm UNet (unclip6 ckpt)       -> models.unet2d.UNetModel
  * AnimateDiff motion module ckpt    -> filtering helper (reference
    animatediff/utils/util.py:106-122: keep "motion_modules.", drop
    "pos_encoder.pe")
  * DreamBooth/LoRA safetensors merge -> merge_lora (reference
    convert_lora_safetensor_to_diffusers.py:50: W += alpha * up @ down)

Conventions: torch Linear weight [out, in] -> flax kernel [in, out];
torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]; GPT-2's Conv1D
already stores [in, out]. Importers return (params, report) where report
lists source keys that were not consumed — refinement is driven by that
list, never by silent dropping.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def t2j(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def linear(sd: Dict, key: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": t2j(sd[f"{key}.weight"]).T}
    if bias and f"{key}.bias" in sd:
        out["bias"] = t2j(sd[f"{key}.bias"])
    return out


def conv(sd: Dict, key: str, bias: bool = True) -> Dict[str, np.ndarray]:
    w = t2j(sd[f"{key}.weight"])
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if bias and f"{key}.bias" in sd:
        out["bias"] = t2j(sd[f"{key}.bias"])
    return out


def norm(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    return {"scale": t2j(sd[f"{key}.weight"]), "bias": t2j(sd[f"{key}.bias"])}


class _Tracker:
    """Wraps a state dict and records consumed keys."""

    def __init__(self, sd: Dict):
        self.sd = {k: v for k, v in sd.items()}
        self.used = set()

    def __contains__(self, k):
        return k in self.sd

    def __getitem__(self, k):
        self.used.add(k)
        return self.sd[k]

    def keys(self):
        return self.sd.keys()

    def unused(self) -> List[str]:
        return sorted(set(self.sd) - self.used)


# ---------------------------------------------------------------------------
# HF GPT-2 -> models.gpt2.TextDecoder
# ---------------------------------------------------------------------------

def import_gpt2(state_dict: Dict, n_layer: int) -> Tuple[Dict, List[str]]:
    """HF GPT2LMHeadModel state dict -> TextDecoder params subtree
    {wte, lm: {wpe, h_i: {...}, ln_f}}. GPT-2 Conv1D weights are stored
    [in, out] (no transpose)."""
    sd = _Tracker({k.replace("transformer.", ""): v
                   for k, v in state_dict.items()
                   if not k.startswith("lm_head")})
    params: Dict[str, Any] = {
        "wte": t2j(sd["wte.weight"]),
        "lm": {"wpe": t2j(sd["wpe.weight"]),
               "ln_f": norm(sd, "ln_f")},
    }
    for i in range(n_layer):
        p = f"h.{i}"
        params["lm"][f"h_{i}"] = {
            "ln_1": norm(sd, f"{p}.ln_1"),
            "c_attn": {"kernel": t2j(sd[f"{p}.attn.c_attn.weight"]),
                       "bias": t2j(sd[f"{p}.attn.c_attn.bias"])},
            "c_proj": {"kernel": t2j(sd[f"{p}.attn.c_proj.weight"]),
                       "bias": t2j(sd[f"{p}.attn.c_proj.bias"])},
            "ln_2": norm(sd, f"{p}.ln_2"),
            "mlp_fc": {"kernel": t2j(sd[f"{p}.mlp.c_fc.weight"]),
                       "bias": t2j(sd[f"{p}.mlp.c_fc.bias"])},
            "mlp_proj": {"kernel": t2j(sd[f"{p}.mlp.c_proj.weight"]),
                         "bias": t2j(sd[f"{p}.mlp.c_proj.bias"])},
        }
    unused = [k for k in sd.unused() if not k.endswith("attn.bias")
              and not k.endswith("attn.masked_bias")]
    return params, unused


# ---------------------------------------------------------------------------
# HF CLIP -> models.clip towers
# ---------------------------------------------------------------------------

def import_hf_clip_vision(state_dict: Dict, layers: int
                          ) -> Tuple[Dict, List[str]]:
    """HF CLIPVisionModel(WithProjection) -> CLIPVisionTower params."""
    sd = _Tracker({k.replace("vision_model.", ""): v
                   for k, v in state_dict.items()})
    params: Dict[str, Any] = {
        "patch_embed": {"kernel": t2j(
            sd["embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": t2j(sd["embeddings.class_embedding"]),
        "positional_embedding": t2j(
            sd["embeddings.position_embedding.weight"]),
        "ln_pre": norm(sd, "pre_layrnorm") if "pre_layrnorm.weight" in sd
        else norm(sd, "pre_layernorm"),
        "ln_post": norm(sd, "post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        params["proj"] = t2j(sd["visual_projection.weight"]).T
    for i in range(layers):
        p = f"encoder.layers.{i}"
        qw = t2j(sd[f"{p}.self_attn.q_proj.weight"])
        kw = t2j(sd[f"{p}.self_attn.k_proj.weight"])
        vw = t2j(sd[f"{p}.self_attn.v_proj.weight"])
        qb = t2j(sd[f"{p}.self_attn.q_proj.bias"])
        kb = t2j(sd[f"{p}.self_attn.k_proj.bias"])
        vb = t2j(sd[f"{p}.self_attn.v_proj.bias"])
        params[f"resblock_{i}"] = {
            "ln_1": norm(sd, f"{p}.layer_norm1"),
            "in_proj": {"kernel": np.concatenate([qw, kw, vw], 0).T,
                        "bias": np.concatenate([qb, kb, vb], 0)},
            "out_proj": linear(sd, f"{p}.self_attn.out_proj"),
            "ln_2": norm(sd, f"{p}.layer_norm2"),
            "mlp_fc": linear(sd, f"{p}.mlp.fc1"),
            "mlp_proj": linear(sd, f"{p}.mlp.fc2"),
        }
    return params, sd.unused()


def import_open_clip_vision(state_dict: Dict, layers: int,
                            prefix: str = "visual."
                            ) -> Tuple[Dict, List[str]]:
    """open_clip VisionTransformer (the bigG tower the reference embeds
    with, modules.py:624-688) -> CLIPVisionTower params."""
    sd = _Tracker({k[len(prefix):]: v for k, v in state_dict.items()
                   if k.startswith(prefix)})
    params: Dict[str, Any] = {
        "patch_embed": {"kernel": t2j(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": t2j(sd["class_embedding"]),
        "positional_embedding": t2j(sd["positional_embedding"]),
        "ln_pre": norm(sd, "ln_pre"),
        "ln_post": norm(sd, "ln_post"),
        "proj": t2j(sd["proj"]),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": norm(sd, f"{p}.ln_1"),
            "in_proj": {"kernel": t2j(sd[f"{p}.attn.in_proj_weight"]).T,
                        "bias": t2j(sd[f"{p}.attn.in_proj_bias"])},
            "out_proj": linear(sd, f"{p}.attn.out_proj"),
            "ln_2": norm(sd, f"{p}.ln_2"),
            "mlp_fc": linear(sd, f"{p}.mlp.c_fc"),
            "mlp_proj": linear(sd, f"{p}.mlp.c_proj"),
        }
    return params, sd.unused()


def import_open_clip_text(state_dict: Dict, layers: int
                          ) -> Tuple[Dict, List[str]]:
    """open_clip text tower (reference FrozenOpenCLIPEmbedder2)."""
    sd = _Tracker({k: v for k, v in state_dict.items()
                   if not k.startswith("visual.")})
    params: Dict[str, Any] = {
        "token_embedding": t2j(sd["token_embedding.weight"]),
        "positional_embedding": t2j(sd["positional_embedding"]),
        "ln_final": norm(sd, "ln_final"),
        "text_projection": t2j(sd["text_projection"]),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": norm(sd, f"{p}.ln_1"),
            "in_proj": {"kernel": t2j(sd[f"{p}.attn.in_proj_weight"]).T,
                        "bias": t2j(sd[f"{p}.attn.in_proj_bias"])},
            "out_proj": linear(sd, f"{p}.attn.out_proj"),
            "ln_2": norm(sd, f"{p}.ln_2"),
            "mlp_fc": linear(sd, f"{p}.mlp.c_fc"),
            "mlp_proj": linear(sd, f"{p}.mlp.c_proj"),
        }
    return params, sd.unused()


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL -> models.vae.AutoencoderKL
# ---------------------------------------------------------------------------

def import_diffusers_vae(state_dict: Dict, num_blocks: int,
                         layers_per_block: int = 2
                         ) -> Tuple[Dict, List[str]]:
    sd = _Tracker(dict(state_dict))
    p: Dict[str, Any] = {
        "quant_conv": conv(sd, "quant_conv"),
        "post_quant_conv": conv(sd, "post_quant_conv"),
        "encoder": {"conv_in": conv(sd, "encoder.conv_in"),
                    "norm_out": norm(sd, "encoder.conv_norm_out"),
                    "conv_out": conv(sd, "encoder.conv_out")},
        "decoder": {"conv_in": conv(sd, "decoder.conv_in"),
                    "norm_out": norm(sd, "decoder.conv_norm_out"),
                    "conv_out": conv(sd, "decoder.conv_out")},
    }

    def resnet(prefix):
        r = {"norm1": norm(sd, f"{prefix}.norm1"),
             "conv1": conv(sd, f"{prefix}.conv1"),
             "norm2": norm(sd, f"{prefix}.norm2"),
             "conv2": conv(sd, f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in sd:
            r["nin_shortcut"] = conv(sd, f"{prefix}.conv_shortcut")
        return r

    def attn(prefix):
        return {"norm": norm(sd, f"{prefix}.group_norm"),
                "q": linear(sd, f"{prefix}.to_q"),
                "k": linear(sd, f"{prefix}.to_k"),
                "v": linear(sd, f"{prefix}.to_v"),
                "proj_out": linear(sd, f"{prefix}.to_out.0")}

    for i in range(num_blocks):
        for j in range(layers_per_block):
            p["encoder"][f"down_{i}_block_{j}"] = resnet(
                f"encoder.down_blocks.{i}.resnets.{j}")
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            p["encoder"][f"down_{i}_downsample"] = {
                "conv": conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
        for j in range(layers_per_block + 1):
            key = f"decoder.up_blocks.{i}.resnets.{j}"
            if f"{key}.norm1.weight" in sd:
                p["decoder"][f"up_{i}_block_{j}"] = resnet(key)
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            p["decoder"][f"up_{i}_upsample"] = {
                "conv": conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}

    for tower in ("encoder", "decoder"):
        p[tower]["mid_block_1"] = resnet(f"{tower}.mid_block.resnets.0")
        p[tower]["mid_block_2"] = resnet(f"{tower}.mid_block.resnets.1")
        p[tower]["mid_attn"] = attn(f"{tower}.mid_block.attentions.0")
    return p, sd.unused()


# ---------------------------------------------------------------------------
# LoRA / DreamBooth merging (reference convert_lora_safetensor_to_diffusers)
# ---------------------------------------------------------------------------

def merge_lora(weight: np.ndarray, up: np.ndarray, down: np.ndarray,
               alpha: float = 0.75) -> np.ndarray:
    """W += alpha * up @ down (reference convert_lora...py:50-120). Handles
    conv LoRA by squeezing the trailing 1x1 dims."""
    if up.ndim == 4:
        up = up.squeeze(-1).squeeze(-1)
        down = down.squeeze(-1).squeeze(-1)
        delta = (up @ down)[:, :, None, None]
    else:
        delta = up @ down
    return weight + alpha * delta


def filter_motion_module(state_dict: Dict) -> Dict:
    """reference animatediff/utils/util.py:106-122: keep only
    'motion_modules.' entries and drop the recomputed positional buffer."""
    return {k: v for k, v in state_dict.items()
            if "motion_modules." in k and "pos_encoder.pe" not in k}
