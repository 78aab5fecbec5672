"""Golden numeric parity: TextDrivenDecoder + DecoderVideo vs a key-exact
torch replica of the reference stack (reference model_variants/
video_decoder.py + BrainModel_neurons.py:28-112): diffusers-style
resnets/attentions, spatial->temporal attention blend with learned scalar,
the batch-of-texts cross-attention quirk, and the commented-out conv_out."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from neurons_tpu.interop.torch_import import _Tracker, import_neurons_ensemble
from neurons_tpu.models.decoder_video import TextDrivenDecoder
import pytest

# slow tier: heavy subprocess/golden drive (see pyproject markers)
pytestmark = pytest.mark.slow

CV, CT = 16, 12          # vision / text dims
BO = (4, 8, 8)           # decoder channels
G = 4                    # groups


class TVDResnet(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(G, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(G, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(tF.silu(self.norm1(x)))
        h = self.conv2(tF.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TVDAttn(tnn.Module):
    """diffusers Attention, deprecated-attn-block style: 1 head of
    dim=channels (attention_head_dim=out_channels), residual."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(G, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.Sequential(tnn.Linear(c, c))

    def forward(self, x):
        is_4d = x.dim() == 4
        if is_4d:
            b, c, h, w = x.shape
            tokens = x.reshape(b, c, h * w).transpose(1, 2)
        else:
            tokens = x
        residual = tokens
        t = self.group_norm(tokens.transpose(1, 2)).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        attn = torch.softmax(q @ k.transpose(-1, -2)
                             * (q.shape[-1] ** -0.5), dim=-1)
        out = self.to_out(attn @ v) + residual
        if is_4d:
            out = out.transpose(1, 2).reshape(b, c, h, w)
        return out


class TVDUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(tF.interpolate(x, scale_factor=2, mode="nearest"))


def t_spatial_temporal(attn, temp_attn, weight, x, time):
    spatial = attn(x)
    b, c, h, w = spatial.shape
    bb = b // time
    t = spatial.reshape(bb, time, c, h, w).permute(0, 3, 4, 1, 2)
    t = t.reshape(bb * h * w, time, c)
    t = temp_attn(t).reshape(bb, h, w, time, c)
    t = t.permute(0, 3, 4, 1, 2).reshape(b, c, h, w)
    return weight * spatial + (1 - weight) * t


class TTextDrivenDecoder(tnn.Module):
    """Key-exact replica (reference BrainModel_neurons.py:28-112 +
    video_decoder.py DecoderVideo)."""

    def __init__(self):
        super().__init__()
        self.q = tnn.Linear(CV, CT, bias=False)
        self.k = tnn.Linear(CT, CT, bias=False)
        self.v = tnn.Linear(CT, CT, bias=False)
        self.out = tnn.Linear(CT, CT, bias=False)
        self.norm = tnn.GroupNorm(1, 64)
        self.maps_projector = tnn.Sequential(
            tnn.Conv2d(CT, 512, 1, bias=False), tnn.GroupNorm(1, 512),
            tnn.ReLU(True), tnn.Conv2d(512, 128, 1, bias=False),
            tnn.GroupNorm(1, 128), tnn.ReLU(True),
            tnn.Conv2d(128, 64, 1, bias=True))
        vd = self.video_decoder = tnn.Module()
        vd.conv_in = tnn.Conv2d(64, BO[-1], 3, padding=1)
        mid = vd.mid_block = tnn.Module()
        mid.resnets = tnn.ModuleList([TVDResnet(BO[-1], BO[-1]),
                                      TVDResnet(BO[-1], BO[-1])])
        mid.attentions = tnn.ModuleList([TVDAttn(BO[-1])])
        mid.temp_attentions = tnn.ModuleList([TVDAttn(BO[-1])])
        mid.weights = tnn.ParameterList([tnn.Parameter(torch.ones(1))])
        vd.up_blocks = tnn.ModuleList()
        rev = list(reversed(BO))
        ch = BO[-1]
        for i, out_c in enumerate(rev):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            blk.attentions = tnn.ModuleList()
            blk.temp_attentions = tnn.ModuleList()
            blk.weights = tnn.ParameterList()
            for j in range(2):  # layers_per_block=1 -> 2 resnets
                blk.resnets.append(TVDResnet(ch, out_c))
                ch = out_c
                blk.attentions.append(TVDAttn(ch))
                blk.temp_attentions.append(TVDAttn(ch))
                blk.weights.append(tnn.Parameter(torch.ones(1)))
            if i != len(rev) - 1:
                blk.upsamplers = tnn.ModuleList([TVDUp(ch)])
            vd.up_blocks.append(blk)
        vd.conv_norm_out = tnn.GroupNorm(G, BO[0], eps=1e-6)
        self.seg_head = tnn.Conv2d(BO[0], 1, 3, padding=1)
        self.recon_head = tnn.Conv2d(BO[0], 4, 3, padding=1)

    def forward(self, vision_feat, text_feat, time, is_seg):
        q = self.q(vision_feat)
        k, v = self.k(text_feat), self.v(text_feat)
        scale = CV ** -0.5
        attn = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
        x = self.out(attn @ v)
        b, n, c = x.shape
        hw = int(n ** 0.5)
        x = x.transpose(1, 2).reshape(b, c, hw, hw)
        x = self.maps_projector(x)
        x = self.norm(x.reshape(b, -1, hw, hw))
        vd = self.video_decoder
        x = vd.conv_in(x)
        mid = vd.mid_block
        x = mid.resnets[0](x)
        x = t_spatial_temporal(mid.attentions[0], mid.temp_attentions[0],
                               mid.weights[0], x, time)
        x = mid.resnets[1](x)
        for blk in vd.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = res(x)
                x = t_spatial_temporal(blk.attentions[j],
                                       blk.temp_attentions[j],
                                       blk.weights[j], x, time)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        x = tF.silu(vd.conv_norm_out(x))
        return self.seg_head(x) if is_seg else self.recon_head(x)


class TestTextDrivenDecoderParity:
    def test_seg_and_recon_match(self):
        torch.manual_seed(0)
        tm = TTextDrivenDecoder().eval()
        # randomize the blend weights so the temporal path is exercised
        with torch.no_grad():
            tm.video_decoder.mid_block.weights[0].fill_(0.7)
            for blk in tm.video_decoder.up_blocks:
                for w in blk.weights:
                    w.fill_(0.6)
        sd = {f"text_seg_dec.{k}": v for k, v in tm.state_dict().items()}
        from neurons_tpu.interop.torch_import import (_decoder_video,
                                                      linear, norm, conv)
        tr = _Tracker(sd)
        params = {
            "q": linear(tr, "text_seg_dec.q"),
            "k": linear(tr, "text_seg_dec.k"),
            "v": linear(tr, "text_seg_dec.v"),
            "out": linear(tr, "text_seg_dec.out"),
            "norm": norm(tr, "text_seg_dec.norm"),
            "maps_0": conv(tr, "text_seg_dec.maps_projector.0"),
            "maps_gn_0": norm(tr, "text_seg_dec.maps_projector.1"),
            "maps_1": conv(tr, "text_seg_dec.maps_projector.3"),
            "maps_gn_1": norm(tr, "text_seg_dec.maps_projector.4"),
            "maps_2": conv(tr, "text_seg_dec.maps_projector.6"),
            "video_decoder": _decoder_video(
                tr, "text_seg_dec.video_decoder", 3, 1),
            "seg_head": conv(tr, "text_seg_dec.seg_head"),
            "recon_head": conv(tr, "text_seg_dec.recon_head"),
        }
        assert tr.unused() == [], tr.unused()

        time = 2
        jm = TextDrivenDecoder(clip_vision_emb_dim=CV, clip_txt_emb_dim=CT,
                               decoder_block_out_channels=BO)
        rs = np.random.RandomState(0)
        vision = rs.randn(2 * time, 16, CV).astype(np.float32)  # 4x4 grid
        text = rs.randn(2 * time, CT).astype(np.float32)

        with torch.no_grad():
            ref_seg = tm(torch.tensor(vision), torch.tensor(text), time,
                         True).numpy()
            ref_rec = tm(torch.tensor(vision), torch.tensor(text), time,
                         False).numpy()
        got_seg = jm.apply({"params": params}, jnp.asarray(vision),
                           jnp.asarray(text), time=time, is_seg=True)
        got_rec = jm.apply({"params": params}, jnp.asarray(vision),
                           jnp.asarray(text), time=time, is_seg=False)

        def to_nchw(y):
            return np.asarray(y)

        np.testing.assert_allclose(to_nchw(got_seg), ref_seg, rtol=2e-3,
                                   atol=2e-3)
        np.testing.assert_allclose(to_nchw(got_rec), ref_rec, rtol=2e-3,
                                   atol=2e-3)
