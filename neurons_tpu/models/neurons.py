"""The `Neurons` ensemble: one flax module bundling every trainable piece.

Replaces the reference's empty `nn.Module` container with ad-hoc attribute
attachment (reference BrainModel_neurons.py:204-209 + train_neurons.py:
148-226) with an explicit composition whose parameter tree is the single
checkpoint unit (one Orbax dir covers the ensemble, like the reference's one
.pth file). Submodules are created per stage; absent heads simply have no
params, mirroring the reference's strict=False layered checkpoint loading.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import (BrainModelConfig, DecouplerConfig, PriorConfig)
from neurons_tpu.models.brain import (BrainBackbone, CLIPProj, MotionProj,
                                      MultiLabelClassifier, RidgeRegression)
from neurons_tpu.models.decoder_video import TextDrivenDecoder
from neurons_tpu.models.gpt2 import GPT2Config, TextDecoder
from neurons_tpu.models.prior import PriorNetwork


class NeuronsCore(nn.Module):
    """Stage-1 trainable core: ridge -> backbone -> clipproj
    (reference train_neurons.py:228-241, 389-395)."""

    cfg: BrainModelConfig

    def setup(self):
        c = self.cfg
        self.ridge = RidgeRegression(input_sizes=c.voxel_counts,
                                     out_features=c.hidden_dim,
                                     seq_len=c.seq_len)
        self.backbone = BrainBackbone(c)
        self.clipproj = CLIPProj(in_dim=c.clip_emb_dim,
                                 out_dim=c.clip_txt_emb_dim)

    def __call__(self, voxel: jax.Array, subj_idx: int = 0,
                 deterministic: bool = True):
        voxel_ridge = self.ridge(voxel, subj_idx)
        voxels_embed, clip_vision_embeds = self.backbone(
            voxel_ridge, deterministic=deterministic)
        clip_text_embeds = self.clipproj(clip_vision_embeds)
        return voxels_embed, clip_vision_embeds, clip_text_embeds

    def encode(self, voxel: jax.Array, subj_idx: int = 0):
        """Inference path used by stages 3/e (ridge -> backbone only)."""
        voxel_ridge = self.ridge(voxel, subj_idx)
        return self.backbone(voxel_ridge, deterministic=True)

    def project_text(self, tokens: jax.Array):
        return self.clipproj(tokens)


class NeuronsDecoupler(nn.Module):
    """Stage-2 ensemble: frozen core + prior + decoupler heads
    (reference train_neurons.py:157-226). The seg/recon decoder and the
    GPT-2 captioner live in their own modules (decoder_video / text_decoder)
    because they carry imported foreign weights; this module owns the
    prior, motion projection and classifier."""

    brain_cfg: BrainModelConfig
    prior_cfg: PriorConfig
    dec_cfg: DecouplerConfig
    gpt2_cfg: GPT2Config = GPT2Config()

    def setup(self):
        self.core = NeuronsCore(self.brain_cfg)
        self.prior_net = PriorNetwork(self.prior_cfg)
        self.motion_proj = MotionProj(n_frames=self.dec_cfg.n_frames,
                                      clip_size=self.dec_cfg.clip_emb_dim)
        self.classifier = MultiLabelClassifier(
            in_channel_text=self.dec_cfg.clip_txt_emb_dim,
            class_num=self.dec_cfg.num_classes)
        self.text_seg_dec = TextDrivenDecoder(
            clip_vision_emb_dim=self.dec_cfg.clip_emb_dim,
            clip_txt_emb_dim=self.dec_cfg.clip_txt_emb_dim,
            decoder_block_out_channels=self.dec_cfg.decoder_block_out_channels,
            decoder_layers_per_block=self.dec_cfg.decoder_layers_per_block)
        self.text_dec = TextDecoder(self.gpt2_cfg,
                                    prefix_size=self.dec_cfg.clip_txt_emb_dim)

    def __call__(self, voxel: jax.Array, tokens: jax.Array,
                 subj_idx: int = 0):
        """Init-shape pass touching every submodule."""
        voxels_embed, clip_vision, clip_text = self.core(voxel, subj_idx)
        b, n, d = clip_vision.shape
        times = jnp.zeros((b,), jnp.int32)
        pred = self.prior_net(clip_vision, times, clip_vision)
        motion = self.motion_proj(pred)
        pooled = motion.mean(axis=1).mean(axis=1)
        cls = self.classifier(pooled)
        f = self.dec_cfg.n_frames
        flat = motion.reshape(b * f, n, d)
        seg = self.text_seg_dec(flat, clip_text, time=b * f)
        logits = self.text_dec(clip_text, tokens)
        return voxels_embed, clip_vision, clip_text, pred, motion, cls, seg, logits

    # --- stage-2 sub-paths, exposed for nn.apply(method=...) ---

    def seg_decode(self, vision_tokens, text_embed, time: int,
                   is_seg: bool = True, return_all: bool = False,
                   deterministic: bool = True):
        return self.text_seg_dec(vision_tokens, text_embed, time=time,
                                 is_seg=is_seg, return_all=return_all,
                                 deterministic=deterministic)

    def caption_logits(self, clip_features, tokens):
        return self.text_dec(clip_features, tokens)

    def caption_greedy(self, clip_features, max_len: int = 60,
                       eot_token: int = 49407):
        return self.text_dec.greedy_decode(clip_features, max_len, eot_token)

    # --- stage-2 sub-paths, exposed for nn.apply(method=...) ---

    def encode(self, voxel, subj_idx: int = 0):
        return self.core(voxel, subj_idx)

    def prior_apply(self, image_embed, times, brain_embed,
                    brain_cond_drop_prob: float = 0.0,
                    image_cond_drop_prob: float = 0.0,
                    rng: Optional[jax.Array] = None, attn_bias=None):
        return self.prior_net(image_embed, times, brain_embed,
                              brain_cond_drop_prob=brain_cond_drop_prob,
                              image_cond_drop_prob=image_cond_drop_prob,
                              rng=rng, attn_bias=attn_bias)

    def motion(self, prior_out):
        return self.motion_proj(prior_out)

    def classify(self, pooled_motion):
        return self.classifier(pooled_motion)

    def project_text(self, tokens):
        return self.core.clipproj(tokens)
