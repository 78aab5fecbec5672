"""AnimateDiff video UNet (UNet3D + temporal motion modules), flax.

Re-design of the reference's vendored AnimateDiff stack (reference
animatediff/models/unet.py:38-572, unet_blocks.py, attention.py,
motion_module.py, resnet.py; configured by configs/inference/
inference-v3.yaml): an SD-1.5 UNet "inflated" to video with a temporal
motion module after every spatial transformer.

TPU-first layout decision: the reference carries 5-D NCFHW tensors and
rearranges at every block (InflatedConv3d = fold/unfold per conv,
reference resnet.py:10-29). Here activations live as [(B*F), H, W, C]
NHWC *throughout* — inflated convs/norms become ordinary convs/GroupNorms
(v3's use_inflated_groupnorm IS per-frame GroupNorm), and only the two
attention layouts reshape:
  * spatial:  tokens [(B F), H*W, C], text context repeated per frame
    (reference attention.py:98-100)
  * temporal: tokens [(B H W), F, C] with interleaved-sinusoid positional
    encoding (reference motion_module.py:225-243,275)
The temporal token batch (B*H*W rows of F frames) is where the `frame`
mesh axis shards for long clips (SURVEY.md section 5).

Motion modules: GroupNorm -> proj_in -> N x [LayerNorm -> temporal
self-attention -> residual, FF] -> zero-init proj_out -> residual
(reference motion_module.py:47-120; v3: 1 block of 2 Temporal_Self).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import UNet3DConfig
from neurons_tpu.models.unet2d import timestep_embedding, zero_init
from neurons_tpu.ops.attention import dot_product_attention
from neurons_tpu.ops.fused_norm import GroupNorm, GroupNormSiLU
from neurons_tpu.ops.temporal_attention import temporal_attention


def temporal_pos_encoding(max_len: int, dim: int) -> jnp.ndarray:
    """Interleaved sin/cos (reference motion_module.py:225-243):
    pe[:, 0::2] = sin, pe[:, 1::2] = cos."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    pe = jnp.zeros((max_len, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div[: (dim + 1) // 2]))
    return pe


class TemporalMHA(nn.Module):
    """Temporal self-attention computed IN the folded [(B F), D, C] layout.

    Numerically identical to transposing to [(B D), F, C] and running MHA
    (the reference motion_module.py:275 rearrange), but expressed as
    batched einsums over a reshaped [B, F, D, H, hd] view so XLA folds the
    layout change into the matmuls instead of materializing two physical
    transposes of the full activation per attention (profiled on v5e:
    the explicit rearrange cost ~0.2 ms/site/step in HBM copies).
    Same submodule names/shapes as MHAttention -> same checkpoint layout."""

    dim: int
    heads: int
    n_frames: int

    @nn.compact
    def __call__(self, t):
        f = self.n_frames
        h = self.heads
        hd = self.dim // h
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(t)
        k = nn.Dense(self.dim, use_bias=False, name="to_k")(t)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(t)
        # fused lane-packed kernel on TPU (einsum reference elsewhere):
        # profiled r2, the XLA einsum path spent ~0.8 s/clip in layout
        # copies + f32 logits traffic around these 16-frame attentions
        out = temporal_attention(q, k, v, f, h, hd ** -0.5)
        return nn.Dense(self.dim, name="to_out")(out)


class MHAttention(nn.Module):
    """diffusers CrossAttention-factored MHA (to_q/k/v no-bias, to_out)."""

    dim: int
    heads: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(ctx)
        b, tq, _ = q.shape
        tk = k.shape[1]
        hd = self.dim // self.heads

        def split(y, t):
            return y.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q, tq), split(k, tk), split(v, tk))
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, self.dim)
        return nn.Dense(self.dim, name="to_out")(out)


class GEGLU_FF(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult * 2, name="proj_in")(x)
        val, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) GELU, not tanh-approximate
        return nn.Dense(self.dim, name="proj_out")(
            val * nn.gelu(gate, approximate=False))


class MotionModule(nn.Module):
    """VanillaTemporalModule (reference motion_module.py:47-170).
    Input [(B F), H, W, C]; attends across F per pixel."""

    channels: int
    n_frames: int
    heads: int = 8
    num_blocks: int = 1
    attention_block_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    max_seq_len: int = 32
    groups: int = 32

    @nn.compact
    def __call__(self, x, context=None, tattn_cached=None,
                 capture_tattn: bool = False):
        bf, hh, ww, c = x.shape
        f = self.n_frames
        b = bf // f
        residual = x
        captured_t = []
        t_idx = 0
        h = GroupNorm(num_groups=min(self.groups, c), epsilon=1e-6,
                      name="norm")(x)
        tokens = h.reshape(bf, hh * ww, c)
        tokens = nn.Dense(c, name="proj_in")(tokens)
        # (b f) d c -> (b d) f c
        d = hh * ww

        def to_temporal(t):
            t = t.reshape(b, f, d, c).transpose(0, 2, 1, 3)
            return t.reshape(b * d, f, c)

        def from_temporal(t):
            t = t.reshape(b, d, f, c).transpose(0, 2, 1, 3)
            return t.reshape(bf, d, c)

        # pe computed in f32 for sin/cos accuracy, applied in the
        # activation dtype (f32 would promote the temporal attention)
        pe = temporal_pos_encoding(self.max_seq_len, c)[:f].astype(x.dtype)
        for blk in range(self.num_blocks):
            for ai, att_type in enumerate(self.attention_block_types):
                name = f"block_{blk}_attn_{ai}"
                is_cross = att_type.endswith("Cross") and context is not None
                # temporal attention residual broadcast (PAB, arXiv
                # 2408.12588): reuse the residual across adjacent steps
                if tattn_cached is not None:
                    tokens = tattn_cached[t_idx] + tokens
                    if capture_tattn:
                        captured_t.append(tattn_cached[t_idx])
                    t_idx += 1
                    continue
                t = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm")(tokens)
                if is_cross:
                    # cross-attn over external context: keep the explicit
                    # temporal rearrange (reference motion_module.py:275)
                    t = to_temporal(t) + pe[None]
                    ctx = jnp.repeat(context, d, axis=0)
                    t = MHAttention(c, self.heads, name=name)(t, ctx)
                    tattn = from_temporal(t)
                else:
                    # pe[frame] added in the folded layout (same values the
                    # [(b d), f, c] layout would see)
                    t = (t.reshape(b, f, d, c)
                         + pe[None, :, None, :]).reshape(bf, d, c)
                    tattn = TemporalMHA(c, self.heads, f, name=name)(t)
                if capture_tattn:
                    captured_t.append(tattn)
                t_idx += 1
                tokens = tattn + tokens
            t = nn.LayerNorm(epsilon=1e-5, name=f"block_{blk}_ff_norm")(tokens)
            tokens = GEGLU_FF(c, name=f"block_{blk}_ff")(t) + tokens
        out = nn.Dense(c, kernel_init=zero_init(), name="proj_out")(tokens)
        out = out.reshape(bf, hh, ww, c) + residual
        if capture_tattn:
            return out, jnp.stack(captured_t)
        return out


class ResnetBlock3D(nn.Module):
    """Per-frame resnet (reference resnet.py ResnetBlock3D with
    InflatedConv3d == plain 2D conv in folded layout)."""

    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, emb):
        from neurons_tpu.ops import fused_conv as fc

        residual = x
        if fc._enabled():
            gs, gb = fc.GNParams(x.shape[-1], name="norm1")()
            k1, b1 = fc.ConvParams(x.shape[-1], self.out_channels,
                                   name="conv1")()
            h = fc.gn_silu_conv(x, gs, gb, k1, b1,
                                min(self.groups, x.shape[-1]), 1e-5)
            e = nn.Dense(self.out_channels,
                         name="time_emb_proj")(nn.silu(emb))
            h = h + e[:, None, None, :]
            gs2, gb2 = fc.GNParams(self.out_channels, name="norm2")()
            k2, b2 = fc.ConvParams(self.out_channels, self.out_channels,
                                   name="conv2")()
            h = fc.gn_silu_conv(h, gs2, gb2, k2, b2,
                                min(self.groups, self.out_channels), 1e-5)
        else:
            h = GroupNormSiLU(num_groups=min(self.groups, x.shape[-1]),
                              epsilon=1e-5, name="norm1")(x)
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        name="conv1")(h)
            e = nn.Dense(self.out_channels,
                         name="time_emb_proj")(nn.silu(emb))
            h = h + e[:, None, None, :]
            h = GroupNormSiLU(num_groups=min(self.groups,
                                             self.out_channels),
                              epsilon=1e-5, name="norm2")(h)
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1),
                               name="conv_shortcut")(residual)
        return residual + h


class Transformer3D(nn.Module):
    """Spatial transformer per frame (reference attention.py:31-142):
    GN -> conv/linear proj_in -> blocks(self + text cross + ff) -> proj_out.
    Context arrives per-batch [B, 77, Ctx] and is repeated per frame."""

    channels: int
    heads: int
    context_dim: int
    n_frames: int
    depth: int = 1
    groups: int = 32

    @nn.compact
    def __call__(self, x, context, xattn_cached=None, capture: bool = False,
                 sattn_cached=None, capture_sattn: bool = False):
        bf, hh, ww, c = x.shape
        residual = x
        h = GroupNorm(num_groups=min(self.groups, c), epsilon=1e-6,
                      name="norm")(x)
        tokens = h.reshape(bf, hh * ww, c)
        tokens = nn.Dense(c, name="proj_in")(tokens)
        ctx = jnp.repeat(context, self.n_frames, axis=0)  # [B*F, 77, Ctx]
        captured = []
        captured_s = []
        for i in range(self.depth):
            name = f"block_{i}"
            # spatial self-attn residual broadcast (PAB, arXiv 2408.12588:
            # attention outputs of adjacent diffusion steps are nearly
            # identical — reuse the residual for `sattn_cached` steps)
            if sattn_cached is not None:
                sattn = sattn_cached[i]
            else:
                t = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm1")(tokens)
                sattn = MHAttention(c, self.heads, name=f"{name}_attn1")(t)
            if capture_sattn:
                captured_s.append(sattn)
            tokens = sattn + tokens
            # cross-attn residual gating (TGATE, arXiv 2404.02747): the
            # text context is the ONLY thing that distinguishes the CFG
            # halves, so freezing this branch lets the sampler collapse
            # the doubled batch (see pipelines/video.py tgate_step)
            if xattn_cached is not None:
                xattn = xattn_cached[i]
            else:
                t = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm2")(tokens)
                xattn = MHAttention(c, self.heads,
                                    context_dim=self.context_dim,
                                    name=f"{name}_attn2")(t, ctx)
            if capture:
                captured.append(xattn)
            tokens = xattn + tokens
            t = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm3")(tokens)
            tokens = GEGLU_FF(c, name=f"{name}_ff")(t) + tokens
        tokens = nn.Dense(c, name="proj_out")(tokens)
        out = tokens.reshape(bf, hh, ww, c) + residual
        extras = ()
        if capture:
            extras += (jnp.stack(captured),)
        if capture_sattn:
            extras += (jnp.stack(captured_s),)
        if extras:
            return (out,) + extras
        return out


def video_cross_attn_sites(cfg: UNet3DConfig):
    """[(site_name, depth)] of every Transformer3D (text cross-attn) site
    in `UNet3DModel.__call__` order — mirrors its loop structure."""
    sites = []
    for i, btype in enumerate(cfg.down_block_types):
        if btype.startswith("CrossAttn"):
            for j in range(cfg.layers_per_block):
                sites.append((f"down_{i}_attn_{j}", 1))
    sites.append(("mid_attn", 1))
    for i, btype in enumerate(cfg.up_block_types):
        if btype.startswith("CrossAttn"):
            for j in range(cfg.layers_per_block + 1):
                sites.append((f"up_{i}_attn_{j}", 1))
    return sites


def video_motion_sites(cfg: UNet3DConfig):
    """Names of every MotionModule site in `UNet3DModel.__call__` order
    (mirrors its loop + `motion_module_resolutions` gating)."""
    sites = []
    res = 1
    for i in range(len(cfg.down_block_types)):
        for j in range(cfg.layers_per_block):
            if cfg.use_motion_module and res in cfg.motion_module_resolutions:
                sites.append(f"down_{i}_motion_{j}")
        if i != len(cfg.down_block_types) - 1:
            res *= 2
    for i in range(len(cfg.up_block_types)):
        for j in range(cfg.layers_per_block + 1):
            if cfg.use_motion_module and res in cfg.motion_module_resolutions:
                sites.append(f"up_{i}_motion_{j}")
        if i != len(cfg.up_block_types) - 1:
            res //= 2
    return sites


class UNet3DModel(nn.Module):
    """Inputs (reference contract): sample [B, 4, F, H, W], timesteps [B],
    encoder_hidden_states [B, 77, ctx]; optional controlnet residuals
    (reference unet.py:422-439). Returns eps prediction [B, 4, F, H, W].

    TGATE hooks (arXiv 2404.02747; PAPERS.md): `capture_xattn=True` also
    returns {site: [depth, (B F), tokens, C]} of cross-attn residuals;
    `xattn_cached` replaces each site's cross-attn with the cached values
    (the text context becomes unused)."""

    cfg: UNet3DConfig
    n_frames: int = 16

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 down_block_residuals=None, mid_block_residual=None,
                 cached=None, return_cache: bool = False,
                 xattn_cached=None, capture_xattn: bool = False,
                 sattn_cached=None, capture_sattn: bool = False,
                 tattn_cached=None, capture_tattn: bool = False):
        c = self.cfg
        f = self.n_frames
        b = sample.shape[0]
        g = c.norm_num_groups

        temb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = nn.Dense(c.block_out_channels[0] * 4, name="time_emb_1")(temb)
        temb = nn.Dense(c.block_out_channels[0] * 4,
                        name="time_emb_2")(nn.silu(temb))
        # cast: keep the f32 timestep embedding from promoting the whole
        # bf16 UNet to f32 (2x MXU cost — profiled on v5e)
        temb_f = jnp.repeat(temb, f, axis=0).astype(sample.dtype)

        xattn_out = {}
        sattn_out = {}
        tattn_out = {}

        def motion(ch, res, name):
            if not (c.use_motion_module and res in c.motion_module_resolutions):
                return None
            mm = MotionModule(
                ch, f, heads=c.motion_num_attention_heads,
                num_blocks=c.motion_num_transformer_block,
                attention_block_types=c.motion_attention_block_types,
                max_seq_len=c.motion_max_seq_length,
                groups=g, name=name)

            def run(h):
                r = mm(h,
                       tattn_cached=(None if tattn_cached is None
                                     else tattn_cached[name]),
                       capture_tattn=capture_tattn)
                if capture_tattn:
                    r, tattn_out[name] = r
                return r

            return run

        def spatial_attn(name, h, ch):
            r = Transformer3D(ch, ch // c.attention_head_dim
                              if c.attention_head_dim > 8 else
                              c.attention_head_dim,
                              c.cross_attention_dim, f, groups=g,
                              name=name)(
                h, encoder_hidden_states,
                xattn_cached=(None if xattn_cached is None
                              else xattn_cached[name]),
                capture=capture_xattn,
                sattn_cached=(None if sattn_cached is None
                              else sattn_cached[name]),
                capture_sattn=capture_sattn)
            if capture_xattn or capture_sattn:
                extras = list(r[1:])
                r = r[0]
                if capture_xattn:
                    xattn_out[name] = extras.pop(0)
                if capture_sattn:
                    sattn_out[name] = extras.pop(0)
            return r

        if cached is not None:
            # Faster-Diffusion encoder propagation (PAPERS.md, arXiv
            # 2312.09608): reuse the down-path features, run mid+decoder
            h, skip_tuple = cached
            skips = list(skip_tuple)
            res = 2 ** (len(c.down_block_types) - 1)
            return self._decode(h, skips, temb_f, encoder_hidden_states,
                                down_block_residuals, mid_block_residual,
                                b, f, res, motion, return_cache=False,
                                cache=None, spatial_attn=spatial_attn,
                                capture_xattn=capture_xattn,
                                xattn_out=xattn_out,
                                capture_sattn=capture_sattn,
                                sattn_out=sattn_out,
                                capture_tattn=capture_tattn,
                                tattn_out=tattn_out)

        # [B, C, F, H, W] -> [(B F), H, W, C]
        h = sample.transpose(0, 2, 3, 4, 1).reshape(
            b * f, sample.shape[3], sample.shape[4], sample.shape[1])
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(h)

        skips = [h]
        res = 1
        # --- down blocks ---
        for i, btype in enumerate(c.down_block_types):
            ch = c.block_out_channels[i]
            is_cross = btype.startswith("CrossAttn")
            for j in range(c.layers_per_block):
                h = ResnetBlock3D(ch, groups=g,
                                  name=f"down_{i}_res_{j}")(h, temb_f)
                if is_cross:
                    h = spatial_attn(f"down_{i}_attn_{j}", h, ch)
                mm = motion(ch, res, f"down_{i}_motion_{j}")
                if mm is not None:
                    h = mm(h)
                skips.append(h)
            if i != len(c.down_block_types) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            name=f"down_{i}_downsample")(h)
                skips.append(h)
                res *= 2

        return self._decode(h, skips, temb_f, encoder_hidden_states,
                            down_block_residuals, mid_block_residual,
                            b, f, res, motion, return_cache=return_cache,
                            cache=(h, tuple(skips)),
                            spatial_attn=spatial_attn,
                            capture_xattn=capture_xattn,
                            xattn_out=xattn_out,
                            capture_sattn=capture_sattn,
                            sattn_out=sattn_out,
                            capture_tattn=capture_tattn,
                            tattn_out=tattn_out)

    def _decode(self, h, skips, temb_f, encoder_hidden_states,
                down_block_residuals, mid_block_residual, b, f, res,
                motion, return_cache, cache, spatial_attn,
                capture_xattn=False, xattn_out=None,
                capture_sattn=False, sattn_out=None,
                capture_tattn=False, tattn_out=None):
        """Mid + up + out (plain helper inside the compact scope; all
        submodules carry explicit names so the cached path addresses the
        same parameters)."""
        c = self.cfg
        g = c.norm_num_groups
        # --- mid ---
        ch = c.block_out_channels[-1]
        h = ResnetBlock3D(ch, groups=g, name="mid_res_0")(h, temb_f)
        h = spatial_attn("mid_attn", h, ch)
        # v3: motion_module_mid_block false — no mid motion module
        h = ResnetBlock3D(ch, groups=g, name="mid_res_1")(h, temb_f)

        if mid_block_residual is not None:
            h = h + mid_block_residual

        # --- up blocks ---
        rev_channels = list(reversed(c.block_out_channels))
        if down_block_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_residuals)]
        for i, btype in enumerate(c.up_block_types):
            ch = rev_channels[i]
            is_cross = btype.startswith("CrossAttn")
            for j in range(c.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock3D(ch, groups=g,
                                  name=f"up_{i}_res_{j}")(h, temb_f)
                if is_cross:
                    h = spatial_attn(f"up_{i}_attn_{j}", h, ch)
                mm = motion(ch, res, f"up_{i}_motion_{j}")
                if mm is not None:
                    h = mm(h)
            if i != len(c.up_block_types) - 1:
                bf, hh, ww, cc = h.shape
                h = jax.image.resize(h, (bf, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1,
                            name=f"up_{i}_upsample")(h)
                res //= 2

        # reference AnimateDiff UNet norm_eps=1e-5 (animatediff/models/
        # unet.py:70,245-247), unlike the 1e-6 transformer entry norms
        h = GroupNorm(num_groups=min(g, h.shape[-1]), epsilon=1e-5,
                      name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(c.out_channels, (3, 3), padding=1,
                    kernel_init=zero_init(), name="conv_out")(h)
        # [(B F), H, W, C] -> [B, C, F, H, W]
        h = h.reshape(b, f, h.shape[1], h.shape[2], h.shape[3])
        out = h.transpose(0, 4, 1, 2, 3)
        extras = ()
        if return_cache:
            extras += (cache,)
        if capture_xattn:
            extras += (xattn_out,)
        if capture_sattn:
            extras += (sattn_out,)
        if capture_tattn:
            extras += (tattn_out,)
        if extras:
            return (out,) + extras
        return out
