"""SparseCtrl controlnet (AnimateDiff-SparseCtrl, RGB/latent condition).

Re-design of reference animatediff/models/sparse_controlnet.py: a copy of
the UNet3D encoder whose input is zeroed (set_noisy_sample_input_to_zero,
reference :467-469), conditioned by a per-frame sparse condition + binary
frame mask concatenated on channels (reference :517-521), embedded by a
single zero-init conv in "simplified" mode (latent conditioning,
configs/inference/sparsectrl/latent_condition.yaml: conditioning_channels 4
+ mask -> 5), with zero-conv output heads per skip and for the mid block
(reference :244-295). Residuals are scaled by `conditioning_scale` and
added to the UNet3D skips.

Same folded [(B F), H, W, C] NHWC layout as models/unet3d.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import UNet3DConfig
from neurons_tpu.models.unet2d import timestep_embedding, zero_init
from neurons_tpu.models.unet3d import (MotionModule, ResnetBlock3D,
                                       Transformer3D)


class SparseControlNetModel(nn.Module):
    """forward(sample [B,4,F,H,W], t [B], text [B,77,ctx],
    cond [B,Cc,F,H,W], cond_mask [B,1,F,H,W], scale) ->
    (down_residuals tuple, mid_residual), in folded NHWC layout matching
    UNet3DModel's skip list."""

    cfg: UNet3DConfig
    n_frames: int = 16
    conditioning_channels: int = 4
    use_simplified_condition_embedding: bool = True
    set_noisy_sample_input_to_zero: bool = True
    concate_conditioning_mask: bool = True
    motion_attention_block_types: Tuple[str, ...] = ("Temporal_Self",)

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 controlnet_cond, conditioning_mask=None,
                 conditioning_scale: float = 1.0):
        c = self.cfg
        f = self.n_frames
        b = sample.shape[0]
        g = c.norm_num_groups

        if self.set_noisy_sample_input_to_zero:
            sample = jnp.zeros_like(sample)

        temb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = nn.Dense(c.block_out_channels[0] * 4, name="time_emb_1")(temb)
        temb = nn.Dense(c.block_out_channels[0] * 4,
                        name="time_emb_2")(nn.silu(temb))
        # cast: keep the f32 timestep embedding from promoting the whole
        # bf16 controlnet to f32 (2x MXU cost — profiled on v5e)
        temb_f = jnp.repeat(temb, f, axis=0).astype(sample.dtype)

        def fold(x):  # [B, C, F, H, W] -> [(B F), H, W, C]
            return x.transpose(0, 2, 3, 4, 1).reshape(
                b * f, x.shape[3], x.shape[4], x.shape[1])

        h = fold(sample)
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(h)

        cond = controlnet_cond
        if self.concate_conditioning_mask:
            assert conditioning_mask is not None
            cond = jnp.concatenate([cond, conditioning_mask], axis=1)
        cond = fold(cond)
        if self.use_simplified_condition_embedding:
            cond = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                           kernel_init=zero_init(),
                           name="cond_embedding")(cond)
        else:
            ch_emb = (16, 32, 96, 256)
            e = nn.Conv(ch_emb[0], (3, 3), padding=1, name="cond_in")(cond)
            e = nn.silu(e)
            for i in range(len(ch_emb) - 1):
                e = nn.silu(nn.Conv(ch_emb[i], (3, 3), padding=1,
                                    name=f"cond_b{i}a")(e))
                e = nn.silu(nn.Conv(ch_emb[i + 1], (3, 3), strides=2,
                                    padding=1, name=f"cond_b{i}b")(e))
            cond = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                           kernel_init=zero_init(), name="cond_out")(e)
        h = h + cond

        def motion(ch, name):
            if not c.use_motion_module:
                return None
            return MotionModule(ch, f, heads=c.motion_num_attention_heads,
                                num_blocks=c.motion_num_transformer_block,
                                attention_block_types=self.motion_attention_block_types,
                                max_seq_len=c.motion_max_seq_length,
                                groups=g, name=name)

        skips = [h]
        for i, btype in enumerate(c.down_block_types):
            ch = c.block_out_channels[i]
            is_cross = btype.startswith("CrossAttn")
            for j in range(c.layers_per_block):
                h = ResnetBlock3D(ch, groups=g,
                                  name=f"down_{i}_res_{j}")(h, temb_f)
                if is_cross:
                    h = Transformer3D(ch, ch // c.attention_head_dim
                                      if c.attention_head_dim > 8 else
                                      c.attention_head_dim,
                                      c.cross_attention_dim, f, groups=g,
                                      name=f"down_{i}_attn_{j}")(
                                          h, encoder_hidden_states)
                mm = motion(ch, f"down_{i}_motion_{j}")
                if mm is not None:
                    h = mm(h)
                skips.append(h)
            if i != len(c.down_block_types) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            name=f"down_{i}_downsample")(h)
                skips.append(h)

        ch = c.block_out_channels[-1]
        h = ResnetBlock3D(ch, groups=g, name="mid_res_0")(h, temb_f)
        h = Transformer3D(ch, ch // c.attention_head_dim
                          if c.attention_head_dim > 8 else c.attention_head_dim,
                          c.cross_attention_dim, f, groups=g,
                          name="mid_attn")(h, encoder_hidden_states)
        h = ResnetBlock3D(ch, groups=g, name="mid_res_1")(h, temb_f)

        down_res = tuple(
            nn.Conv(s.shape[-1], (1, 1), kernel_init=zero_init(),
                    name=f"controlnet_down_{i}")(s) * conditioning_scale
            for i, s in enumerate(skips))
        mid_res = nn.Conv(h.shape[-1], (1, 1), kernel_init=zero_init(),
                          name="controlnet_mid")(h) * conditioning_scale
        return down_res, mid_res
