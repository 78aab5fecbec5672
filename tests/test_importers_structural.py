"""Golden parity tests for the structural weight importers.

Each test builds a MINIMAL torch module replicating the exact state-dict
layout (key names, parameter shapes, forward semantics) of the foreign
checkpoint format — the LDM/sgm UNet (reference openaimodel.py:472-853),
the LDM VAE (reference sgm/modules/diffusionmodules/model.py), the
diffusers SD UNet folded to video (reference animatediff/models/unet.py:
478-572), and AnimateDiff motion modules (reference motion_module.py) —
then imports its weights and checks numeric agreement with the flax
model. Tiny non-square dims so any transposition error fails loudly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from neurons_tpu.config import UNet2DConfig, UNet3DConfig, VAEConfig
from neurons_tpu.interop import torch_import as TI

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch fixture: LDM/sgm UNet building blocks
# ---------------------------------------------------------------------------

def t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TResBlock(tnn.Module):
    def __init__(self, cin, cout, emb_dim, g):
        super().__init__()
        self.in_layers = tnn.Sequential(
            tnn.GroupNorm(g, cin), tnn.SiLU(),
            tnn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb_dim, cout))
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(g, cout), tnn.SiLU(), tnn.Identity(),
            tnn.Conv2d(cout, cout, 3, padding=1))
        self.skip_connection = (tnn.Conv2d(cin, cout, 1) if cin != cout
                                else tnn.Identity())

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        return self.skip_connection(x) + self.out_layers(h)


class TAttn(tnn.Module):
    def __init__(self, dim, ctx_dim, heads, dh):
        super().__init__()
        inner = heads * dh
        self.heads, self.dh = heads, dh
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim))

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b = q.shape[0]

        def sp(y):
            return y.view(b, -1, self.heads, self.dh).transpose(1, 2)

        out = tF.scaled_dot_product_attention(sp(q), sp(k), sp(v))
        return self.to_out(out.transpose(1, 2).reshape(b, -1,
                                                       self.heads * self.dh))


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * tF.gelu(gate)


def t_feedforward(dim):
    return tnn.Sequential(TGEGLU(dim, dim * 4), tnn.Identity(),
                          tnn.Linear(dim * 4, dim))


class TBasicBlock(tnn.Module):
    def __init__(self, dim, ctx_dim, heads, dh):
        super().__init__()
        self.attn1 = TAttn(dim, dim, heads, dh)
        self.attn2 = TAttn(dim, ctx_dim, heads, dh)
        self.ff = tnn.Module()
        self.ff.net = t_feedforward(dim)
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm3 = tnn.LayerNorm(dim)

    def forward(self, x, ctx):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), ctx) + x
        return self.ff.net(self.norm3(x)) + x


class TSpatial(tnn.Module):
    """sgm SpatialTransformer: linear proj (use_linear_in_transformer,
    SD-2.x/unclip) or 1x1-conv proj (SD-1.5)."""

    def __init__(self, c, ctx_dim, heads, dh, depth, g, linear_proj=True):
        super().__init__()
        self.linear_proj = linear_proj
        self.norm = tnn.GroupNorm(g, c, eps=1e-6)
        self.proj_in = (tnn.Linear(c, c) if linear_proj
                        else tnn.Conv2d(c, c, 1))
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(c, ctx_dim, heads, dh) for _ in range(depth)])
        self.proj_out = (tnn.Linear(c, c) if linear_proj
                         else tnn.Conv2d(c, c, 1))

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        t = self.norm(x)
        if self.linear_proj:
            t = t.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            t = self.proj_in(t)
        else:
            t = self.proj_in(t).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        for blk in self.transformer_blocks:
            t = blk(t, ctx)
        if self.linear_proj:
            t = self.proj_out(t)
            t = t.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        else:
            t = t.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
            t = self.proj_out(t)
        return x + t


class TDownsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.op = tnn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class TUpsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(tF.interpolate(x, scale_factor=2, mode="nearest"))


class TLDMUNet(tnn.Module):
    """Key-exact mini replica of the OpenAI/sgm UNetModel layout."""

    def __init__(self, cfg: UNet2DConfig, linear_proj=True,
                 fixed_heads=None, with_label=True):
        super().__init__()
        self.cfg = cfg
        self.with_label = with_label
        lp = linear_proj
        mc = cfg.model_channels
        g = 32 if mc % 32 == 0 else mc
        ted = mc * 4
        if fixed_heads:  # SD-1.5 style: num_heads fixed, dim_head varies
            heads_of = lambda ch: fixed_heads
            dh_of = lambda ch: ch // fixed_heads
        else:
            heads_of = lambda ch: ch // cfg.num_head_channels
            dh_of = lambda ch: cfg.num_head_channels
        self.time_embed = tnn.Sequential(tnn.Linear(mc, ted), tnn.SiLU(),
                                         tnn.Linear(ted, ted))
        if with_label:
            self.label_emb = tnn.Sequential(tnn.Sequential(
                tnn.Linear(cfg.adm_in_channels, ted), tnn.SiLU(),
                tnn.Linear(ted, ted)))
        blocks = [tnn.ModuleList([tnn.Conv2d(cfg.in_channels, mc, 3,
                                             padding=1)])]
        ch, ds = mc, 1
        for level, mult in enumerate(cfg.channel_mult):
            out = mc * mult
            for _ in range(cfg.num_res_blocks):
                layers = [TResBlock(ch, out, ted, g)]
                ch = out
                if ds in cfg.attention_resolutions:
                    layers.append(TSpatial(ch, cfg.context_dim, heads_of(ch),
                                           dh_of(ch),
                                           cfg.transformer_depth[level], g,
                                           linear_proj=lp))
                blocks.append(tnn.ModuleList(layers))
            if level != len(cfg.channel_mult) - 1:
                blocks.append(tnn.ModuleList([TDownsample(ch)]))
                ds *= 2
        self.input_blocks = tnn.ModuleList(blocks)
        self.middle_block = tnn.ModuleList([
            TResBlock(ch, ch, ted, g),
            TSpatial(ch, cfg.context_dim, heads_of(ch),
                     dh_of(ch), cfg.transformer_depth[-1], g,
                     linear_proj=lp),
            TResBlock(ch, ch, ted, g)])
        out_blocks = []
        # mirror of the flax up path: reversed levels, nres+1 blocks each
        skip_chs = self._skip_channels()
        for level in reversed(range(len(cfg.channel_mult))):
            out = mc * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                layers = [TResBlock(ch + skip_chs.pop(), out, ted, g)]
                ch = out
                if ds in cfg.attention_resolutions:
                    layers.append(TSpatial(ch, cfg.context_dim, heads_of(ch),
                                           dh_of(ch),
                                           cfg.transformer_depth[level], g,
                                           linear_proj=lp))
                if level and i == cfg.num_res_blocks:
                    layers.append(TUpsample(ch))
                    ds //= 2
                out_blocks.append(tnn.ModuleList(layers))
        self.output_blocks = tnn.ModuleList(out_blocks)
        self.out = tnn.Sequential(tnn.GroupNorm(g, mc), tnn.SiLU(),
                                  tnn.Conv2d(mc, cfg.out_channels, 3,
                                             padding=1))

    def _skip_channels(self):
        cfg, mc = self.cfg, self.cfg.model_channels
        chs = [mc]
        ch = mc
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mc * mult
                chs.append(ch)
            if level != len(cfg.channel_mult) - 1:
                chs.append(ch)
        return chs  # popped from the END in the up loop

    def forward(self, x, t, context, y):
        emb = self.time_embed(t_timestep_embedding(t, self.cfg.model_channels))
        if self.with_label:
            emb = emb + self.label_emb(y)
        hs = []
        h = x
        for blk in self.input_blocks:
            for layer in blk:
                if isinstance(layer, TResBlock):
                    h = layer(h, emb)
                elif isinstance(layer, TSpatial):
                    h = layer(h, context)
                else:
                    h = layer(h)
            hs.append(h)
        for layer in self.middle_block:
            h = layer(h, emb) if isinstance(layer, TResBlock) \
                else layer(h, context)
        for blk in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            for layer in blk:
                if isinstance(layer, TResBlock):
                    h = layer(h, emb)
                elif isinstance(layer, TSpatial):
                    h = layer(h, context)
                else:
                    h = layer(h)
        return self.out(h)


TINY_UNET = UNet2DConfig(model_channels=8, channel_mult=(1, 2),
                         num_res_blocks=1, attention_resolutions=(2,),
                         transformer_depth=(1, 1), num_head_channels=4,
                         context_dim=12, adm_in_channels=6)


class TestLDMUNetParity:
    def test_forward_matches(self):
        from neurons_tpu.models.unet2d import UNetModel

        tm = TLDMUNet(TINY_UNET).eval()
        params, unused = TI.import_ldm_unet(tm.state_dict(), TINY_UNET)
        assert unused == [], unused

        jm = UNetModel(TINY_UNET)
        x = np.random.RandomState(0).randn(2, 4, 8, 8).astype(np.float32)
        t = np.array([3.0, 17.0], np.float32)
        ctx = np.random.RandomState(1).randn(2, 5, 12).astype(np.float32)
        y = np.random.RandomState(2).randn(2, 6).astype(np.float32)

        with torch.no_grad():
            ref = tm(torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
                     torch.tensor(y)).numpy()
        got = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                       jnp.asarray(ctx), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# torch fixture: LDM VAE
# ---------------------------------------------------------------------------

class TVResnet(tnn.Module):
    def __init__(self, cin, cout, g):
        super().__init__()
        self.norm1 = tnn.GroupNorm(g, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(g, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(tF.silu(self.norm1(x)))
        h = self.conv2(tF.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TVAttn(tnn.Module):
    def __init__(self, c, g):
        super().__init__()
        self.norm = tnn.GroupNorm(g, c, eps=1e-6)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        b, c, hh, ww = h.shape

        def flat(y):
            return y.reshape(b, 1, c, hh * ww).transpose(2, 3)

        out = tF.scaled_dot_product_attention(
            flat(self.q(h)), flat(self.k(h)), flat(self.v(h)))
        out = out.transpose(2, 3).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class TVDown(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2)

    def forward(self, x):
        return self.conv(tF.pad(x, (0, 1, 0, 1)))


class TVUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(tF.interpolate(x, scale_factor=2, mode="nearest"))


TINY_VAE = VAEConfig(in_channels=3, out_channels=3, latent_channels=3,
                     block_out_channels=(8, 16), layers_per_block=1,
                     norm_num_groups=4)


class TLDMVAE(tnn.Module):
    """Key-exact mini replica of the sgm/LDM AutoencoderKL layout
    (encoder.down.{i}.block.{j}, decoder.up in reverse order, 1x1 attn)."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        bo, g, lpb = cfg.block_out_channels, cfg.norm_num_groups, \
            cfg.layers_per_block
        n = len(bo)
        enc = self.encoder = tnn.Module()
        enc.conv_in = tnn.Conv2d(cfg.in_channels, bo[0], 3, padding=1)
        enc.down = tnn.ModuleList()
        ch = bo[0]
        for i in range(n):
            level = tnn.Module()
            level.block = tnn.ModuleList()
            for _ in range(lpb):
                level.block.append(TVResnet(ch, bo[i], g))
                ch = bo[i]
            if i != n - 1:
                level.downsample = TVDown(ch)
            enc.down.append(level)
        enc.mid = tnn.Module()
        enc.mid.block_1 = TVResnet(ch, ch, g)
        enc.mid.attn_1 = TVAttn(ch, g)
        enc.mid.block_2 = TVResnet(ch, ch, g)
        enc.norm_out = tnn.GroupNorm(g, ch, eps=1e-6)
        enc.conv_out = tnn.Conv2d(ch, 2 * cfg.latent_channels, 3, padding=1)
        self.quant_conv = tnn.Conv2d(2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)
        dec = self.decoder = tnn.Module()
        dec.conv_in = tnn.Conv2d(cfg.latent_channels, bo[-1], 3, padding=1)
        dec.mid = tnn.Module()
        dec.mid.block_1 = TVResnet(bo[-1], bo[-1], g)
        dec.mid.attn_1 = TVAttn(bo[-1], g)
        dec.mid.block_2 = TVResnet(bo[-1], bo[-1], g)
        # LDM builds decoder.up with insert(0, ...): up[n-1] applies FIRST
        ups = [None] * n
        ch = bo[-1]
        for pos, i_level in enumerate(reversed(range(n))):
            level = tnn.Module()
            level.block = tnn.ModuleList()
            out = list(reversed(bo))[pos]
            for _ in range(lpb + 1):
                level.block.append(TVResnet(ch, out, g))
                ch = out
            if pos != n - 1:
                level.upsample = TVUp(ch)
            ups[i_level] = level
        dec.up = tnn.ModuleList(ups)
        dec.norm_out = tnn.GroupNorm(g, ch, eps=1e-6)
        dec.conv_out = tnn.Conv2d(ch, cfg.out_channels, 3, padding=1)

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for level in e.down:
            for blk in level.block:
                h = blk(h)
            if hasattr(level, "downsample"):
                h = level.downsample(h)
        h = e.mid.block_2(e.mid.attn_1(e.mid.block_1(h)))
        return self.quant_conv(e.conv_out(tF.silu(e.norm_out(h))))

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid.block_2(d.mid.attn_1(d.mid.block_1(h)))
        for level in reversed(d.up):
            for blk in level.block:
                h = blk(h)
            if hasattr(level, "upsample"):
                h = level.upsample(h)
        return d.conv_out(tF.silu(d.norm_out(h)))


class TestLDMVAEParity:
    def test_encode_decode_match(self):
        from neurons_tpu.models.vae import AutoencoderKL

        tm = TLDMVAE(TINY_VAE).eval()
        params, unused = TI.import_ldm_vae(tm.state_dict(), TINY_VAE)
        assert unused == [], unused

        jm = AutoencoderKL(TINY_VAE)
        x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
        with torch.no_grad():
            ref_m = tm.encode_moments(torch.tensor(x)).numpy()
        post = jm.apply({"params": params}, jnp.asarray(x),
                        method=AutoencoderKL.encode)
        got_m = np.concatenate([np.asarray(post.mean),
                                np.asarray(post.logvar)], axis=1)
        np.testing.assert_allclose(got_m, ref_m, rtol=2e-4, atol=2e-4)

        z = np.random.RandomState(1).randn(2, 3, 4, 4).astype(np.float32)
        with torch.no_grad():
            ref_d = tm.decode(torch.tensor(z)).numpy()
        got_d = jm.apply({"params": params}, jnp.asarray(z),
                         method=AutoencoderKL.decode)
        np.testing.assert_allclose(np.asarray(got_d), ref_d,
                                   rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# torch fixture: diffusers SD UNet folded to video + motion modules
# ---------------------------------------------------------------------------

class TDResnet(tnn.Module):
    """diffusers ResnetBlock2D layout (norm1/conv1/time_emb_proj/norm2/
    conv2/conv_shortcut), applied per-frame."""

    def __init__(self, cin, cout, temb, g):
        super().__init__()
        self.norm1 = tnn.GroupNorm(g, cin, eps=1e-5)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(g, cout, eps=1e-5)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(tF.silu(self.norm1(x)))
        h = h + self.time_emb_proj(tF.silu(temb))[:, :, None, None]
        h = self.conv2(tF.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TDTransformer(tnn.Module):
    """diffusers Transformer2DModel depth-1 with LINEAR proj (our
    Transformer3D uses the linear projection path; the importer squeezes
    1x1-conv checkpoints to the same shape)."""

    def __init__(self, c, ctx_dim, heads, g):
        super().__init__()
        self.norm = tnn.GroupNorm(g, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(c, ctx_dim, heads, c // heads)])
        self.proj_out = tnn.Linear(c, c)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        t = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        t = self.proj_in(t)
        t = self.transformer_blocks[0](t, ctx)
        t = self.proj_out(t)
        return x + t.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TMotionModule(tnn.Module):
    """AnimateDiff VanillaTemporalModule -> temporal_transformer layout
    (reference motion_module.py:47-222): norm -> proj_in -> blocks of
    [norms.a + attention_blocks.a (temporal self-attn w/ sinusoidal pe),
    ff_norm + ff] -> proj_out, residual."""

    def __init__(self, c, heads, max_len, g, num_attn=2):
        super().__init__()
        self.num_attn = num_attn
        tt = self.temporal_transformer = tnn.Module()
        tt.norm = tnn.GroupNorm(g, c, eps=1e-6)
        tt.proj_in = tnn.Linear(c, c)
        blk = tnn.Module()
        blk.norms = tnn.ModuleList(
            [tnn.LayerNorm(c) for _ in range(num_attn)])
        blk.attention_blocks = tnn.ModuleList(
            [TAttn(c, c, heads, c // heads) for _ in range(num_attn)])
        blk.ff_norm = tnn.LayerNorm(c)
        blk.ff = tnn.Module()
        blk.ff.net = t_feedforward(c)
        tt.transformer_blocks = tnn.ModuleList([blk])
        tt.proj_out = tnn.Linear(c, c)
        pe = torch.zeros(max_len, c)
        pos = torch.arange(max_len).float()[:, None]
        div = torch.exp(torch.arange(0, c, 2).float()
                        * (-math.log(10000.0) / c))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div[: (c + 1) // 2])
        self.pe = pe

    def forward(self, x, b, f):
        tt = self.temporal_transformer
        bf, c, hh, ww = x.shape
        residual = x
        h = tt.norm(x).permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        tokens = tt.proj_in(h)
        d = hh * ww
        blk = tt.transformer_blocks[0]
        for a in range(self.num_attn):
            t = blk.norms[a](tokens)
            t = t.reshape(b, f, d, c).transpose(1, 2).reshape(b * d, f, c)
            t = t + self.pe[None, :f]
            t = blk.attention_blocks[a](t)
            t = t.reshape(b, d, f, c).transpose(1, 2).reshape(bf, d, c)
            tokens = t + tokens
        tokens = blk.ff.net(blk.ff_norm(tokens)) + tokens
        out = tt.proj_out(tokens).reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
        return out + residual


TINY_3D = UNet3DConfig(block_out_channels=(8, 16), layers_per_block=1,
                       down_block_types=("CrossAttnDownBlock3D",
                                         "DownBlock3D"),
                       up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
                       cross_attention_dim=12, attention_head_dim=4,
                       norm_num_groups=4, motion_num_attention_heads=2,
                       motion_module_resolutions=(1, 2))


class TDiffusersUNet3D(tnn.Module):
    """Key-exact mini replica of the diffusers SD UNet layout inflated to
    video (reference unet.py from_pretrained_2d): spatial ops run on the
    folded (b f) batch; motion modules attend across frames."""

    def __init__(self, cfg: UNet3DConfig):
        super().__init__()
        self.cfg = cfg
        bo, g, lpb = cfg.block_out_channels, cfg.norm_num_groups, \
            cfg.layers_per_block
        ted = bo[0] * 4
        heads = cfg.attention_head_dim
        self.conv_in = tnn.Conv2d(cfg.in_channels, bo[0], 3, padding=1)
        te = self.time_embedding = tnn.Module()
        te.linear_1 = tnn.Linear(bo[0], ted)
        te.linear_2 = tnn.Linear(ted, ted)
        self.down_blocks = tnn.ModuleList()
        ch = bo[0]
        for i, btype in enumerate(cfg.down_block_types):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            if btype.startswith("CrossAttn"):
                blk.attentions = tnn.ModuleList()
            blk.motion_modules = tnn.ModuleList()
            for _ in range(lpb):
                blk.resnets.append(TDResnet(ch, bo[i], ted, g))
                ch = bo[i]
                if btype.startswith("CrossAttn"):
                    blk.attentions.append(
                        TDTransformer(ch, cfg.cross_attention_dim, heads, g))
                blk.motion_modules.append(
                    TMotionModule(ch, cfg.motion_num_attention_heads,
                                  cfg.motion_max_seq_length, g))
            if i != len(cfg.down_block_types) - 1:
                blk.downsamplers = tnn.ModuleList([tnn.Module()])
                blk.downsamplers[0].conv = tnn.Conv2d(ch, ch, 3, stride=2,
                                                      padding=1)
            self.down_blocks.append(blk)
        mid = self.mid_block = tnn.Module()
        mid.resnets = tnn.ModuleList([TDResnet(ch, ch, ted, g),
                                      TDResnet(ch, ch, ted, g)])
        mid.attentions = tnn.ModuleList(
            [TDTransformer(ch, cfg.cross_attention_dim, heads, g)])
        self.up_blocks = tnn.ModuleList()
        rev = list(reversed(bo))
        skip_chs = self._skip_channels()
        for i, btype in enumerate(cfg.up_block_types):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            if btype.startswith("CrossAttn"):
                blk.attentions = tnn.ModuleList()
            blk.motion_modules = tnn.ModuleList()
            for _ in range(lpb + 1):
                blk.resnets.append(
                    TDResnet(ch + skip_chs.pop(), rev[i], ted, g))
                ch = rev[i]
                if btype.startswith("CrossAttn"):
                    blk.attentions.append(
                        TDTransformer(ch, cfg.cross_attention_dim, heads, g))
                blk.motion_modules.append(
                    TMotionModule(ch, cfg.motion_num_attention_heads,
                                  cfg.motion_max_seq_length, g))
            if i != len(cfg.up_block_types) - 1:
                blk.upsamplers = tnn.ModuleList([tnn.Module()])
                blk.upsamplers[0].conv = tnn.Conv2d(ch, ch, 3, padding=1)
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(g, ch, eps=1e-5)
        self.conv_out = tnn.Conv2d(ch, cfg.out_channels, 3, padding=1)

    def _skip_channels(self):
        cfg, bo = self.cfg, self.cfg.block_out_channels
        chs = [bo[0]]
        ch = bo[0]
        for i in range(len(cfg.down_block_types)):
            for _ in range(cfg.layers_per_block):
                ch = bo[i]
                chs.append(ch)
            if i != len(cfg.down_block_types) - 1:
                chs.append(ch)
        return chs

    def forward(self, sample, t, ctx):
        cfg = self.cfg
        b, _, f, hh, ww = sample.shape
        h = sample.permute(0, 2, 1, 3, 4).reshape(b * f, -1, hh, ww)
        temb = self.time_embedding.linear_2(tF.silu(
            self.time_embedding.linear_1(
                t_timestep_embedding(t, cfg.block_out_channels[0]))))
        temb_f = temb.repeat_interleave(f, dim=0)
        ctx_f = ctx.repeat_interleave(f, dim=0)
        h = self.conv_in(h)
        hs = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb_f)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx_f)
                h = blk.motion_modules[j](h, b, f)
                hs.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                hs.append(h)
        h = self.mid_block.resnets[0](h, temb_f)
        h = self.mid_block.attentions[0](h, ctx_f)
        h = self.mid_block.resnets[1](h, temb_f)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, hs.pop()], dim=1)
                h = res(h, temb_f)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx_f)
                h = blk.motion_modules[j](h, b, f)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0].conv(
                    tF.interpolate(h, scale_factor=2, mode="nearest"))
        h = self.conv_out(tF.silu(self.conv_norm_out(h)))
        return h.reshape(b, f, -1, h.shape[2], h.shape[3]).permute(
            0, 2, 1, 3, 4)


class TSparseControlNet(tnn.Module):
    """Key-exact mini replica of the AnimateDiff SparseControlNetModel
    (reference sparse_controlnet.py:85-315): zeroed sample input, simplified
    zero-conv condition embedding of cond++mask, UNet3D encoder copy with
    1-attention motion modules, zero-conv residual heads."""

    def __init__(self, cfg: UNet3DConfig):
        super().__init__()
        self.cfg = cfg
        bo, g, lpb = cfg.block_out_channels, cfg.norm_num_groups, \
            cfg.layers_per_block
        ted = bo[0] * 4
        self.conv_in = tnn.Conv2d(cfg.in_channels, bo[0], 3, padding=1)
        te = self.time_embedding = tnn.Module()
        te.linear_1 = tnn.Linear(bo[0], ted)
        te.linear_2 = tnn.Linear(ted, ted)
        self.controlnet_cond_embedding = tnn.Conv2d(
            cfg.in_channels + 1, bo[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        self.controlnet_down_blocks = tnn.ModuleList(
            [tnn.Conv2d(bo[0], bo[0], 1)])
        ch = bo[0]
        for i, btype in enumerate(cfg.down_block_types):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            if btype.startswith("CrossAttn"):
                blk.attentions = tnn.ModuleList()
            blk.motion_modules = tnn.ModuleList()
            for _ in range(lpb):
                blk.resnets.append(TDResnet(ch, bo[i], ted, g))
                ch = bo[i]
                if btype.startswith("CrossAttn"):
                    blk.attentions.append(TDTransformer(
                        ch, cfg.cross_attention_dim,
                        cfg.attention_head_dim, g))
                blk.motion_modules.append(TMotionModule(
                    ch, cfg.motion_num_attention_heads,
                    cfg.motion_max_seq_length, g, num_attn=1))
                self.controlnet_down_blocks.append(tnn.Conv2d(ch, ch, 1))
            if i != len(cfg.down_block_types) - 1:
                blk.downsamplers = tnn.ModuleList([tnn.Module()])
                blk.downsamplers[0].conv = tnn.Conv2d(ch, ch, 3, stride=2,
                                                      padding=1)
                self.controlnet_down_blocks.append(tnn.Conv2d(ch, ch, 1))
            self.down_blocks.append(blk)
        mid = self.mid_block = tnn.Module()
        mid.resnets = tnn.ModuleList([TDResnet(ch, ch, ted, g),
                                      TDResnet(ch, ch, ted, g)])
        mid.attentions = tnn.ModuleList([TDTransformer(
            ch, cfg.cross_attention_dim, cfg.attention_head_dim, g)])
        self.controlnet_mid_block = tnn.Conv2d(ch, ch, 1)

    def forward(self, sample, t, ctx, cond, mask, scale=1.0):
        b, _, f, hh, ww = sample.shape
        sample = torch.zeros_like(sample)
        h = sample.permute(0, 2, 1, 3, 4).reshape(b * f, -1, hh, ww)
        temb = self.time_embedding.linear_2(tF.silu(
            self.time_embedding.linear_1(
                t_timestep_embedding(t, self.cfg.block_out_channels[0]))))
        temb_f = temb.repeat_interleave(f, dim=0)
        ctx_f = ctx.repeat_interleave(f, dim=0)
        h = self.conv_in(h)
        c5 = torch.cat([cond, mask], dim=1)
        c5 = c5.permute(0, 2, 1, 3, 4).reshape(b * f, -1, hh, ww)
        h = h + self.controlnet_cond_embedding(c5)
        hs = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb_f)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx_f)
                h = blk.motion_modules[j](h, b, f)
                hs.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                hs.append(h)
        h = self.mid_block.resnets[0](h, temb_f)
        h = self.mid_block.attentions[0](h, ctx_f)
        h = self.mid_block.resnets[1](h, temb_f)
        down = [zc(s) * scale
                for zc, s in zip(self.controlnet_down_blocks, hs)]
        return down, self.controlnet_mid_block(h) * scale


class TestLDMConverters:
    """LDM->diffusers key converters (reference convert_from_ckpt.py)
    round-trip through the diffusers importers to the flax models."""

    def test_sd15_unet_converts_and_matches(self):
        """SD-1.5-style LDM UNet (conv 1x1 proj, fixed heads, no label)
        -> diffusers keys -> UNet3D at n_frames=1 == the 2D torch net."""
        from neurons_tpu.interop.convert_ldm import \
            convert_ldm_unet_to_diffusers
        from neurons_tpu.models.unet3d import UNet3DModel

        ldm_cfg = UNet2DConfig(model_channels=8, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(1,),
                               transformer_depth=(1, 1), num_head_channels=4,
                               context_dim=12)
        tm = TLDMUNet(ldm_cfg, linear_proj=False, fixed_heads=4,
                      with_label=False).eval()
        dsd = convert_ldm_unet_to_diffusers(tm.state_dict())

        cfg3d = UNet3DConfig(block_out_channels=(8, 16), layers_per_block=1,
                             down_block_types=("CrossAttnDownBlock3D",
                                               "DownBlock3D"),
                             up_block_types=("UpBlock3D",
                                             "CrossAttnUpBlock3D"),
                             cross_attention_dim=12, attention_head_dim=4,
                             norm_num_groups=8, use_motion_module=False)
        params, unused = TI.import_animatediff_unet3d(dsd, cfg3d)
        assert unused == [], unused

        jm = UNet3DModel(cfg3d, n_frames=1)
        rs = np.random.RandomState(3)
        x = rs.randn(2, 4, 8, 8).astype(np.float32)
        t = np.array([2.0, 31.0], np.float32)
        ctx = rs.randn(2, 5, 12).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
                     None).numpy()
        got = jm.apply({"params": params}, jnp.asarray(x)[:, :, None],
                       jnp.asarray(t), jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(got)[:, :, 0], ref,
                                   rtol=5e-4, atol=5e-4)

    def test_ldm_vae_converts_and_matches(self):
        from neurons_tpu.interop.convert_ldm import \
            convert_ldm_vae_to_diffusers
        from neurons_tpu.models.vae import AutoencoderKL

        tm = TLDMVAE(TINY_VAE).eval()
        dsd = convert_ldm_vae_to_diffusers(tm.state_dict())
        params, unused = TI.import_diffusers_vae(
            dsd, num_blocks=2, layers_per_block=1)
        assert unused == [], unused
        jm = AutoencoderKL(TINY_VAE)
        z = np.random.RandomState(5).randn(2, 3, 4, 4).astype(np.float32)
        with torch.no_grad():
            ref = tm.decode(torch.tensor(z)).numpy()
        got = jm.apply({"params": params}, jnp.asarray(z),
                       method=AutoencoderKL.decode)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4,
                                   atol=2e-4)

    def test_lora_merge_matches_reference_math(self):
        from neurons_tpu.interop.convert_ldm import merge_lora_into_state_dict

        rs = np.random.RandomState(0)
        w = rs.randn(6, 5).astype(np.float32)
        up = rs.randn(6, 2).astype(np.float32)
        down = rs.randn(2, 5).astype(np.float32)
        target = {
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
            ".weight": w.copy(),
            "mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0"
            ".weight": w.copy(),
        }
        lora = {
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_"
            "attn1_to_q.lora_down.weight": down,
            "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_"
            "attn1_to_q.lora_up.weight": up,
            # to_out.0 flattens to to_out_0 in LoRA naming
            "lora_unet_mid_block_attentions_0_transformer_blocks_0_"
            "attn1_to_out_0.lora_down.weight": down,
            "lora_unet_mid_block_attentions_0_transformer_blocks_0_"
            "attn1_to_out_0.lora_up.weight": up,
        }
        merged, missed = merge_lora_into_state_dict(target, lora, alpha=0.5)
        assert missed == []
        expect = w + 0.5 * (up @ down)
        for k in target:
            np.testing.assert_allclose(merged[k], expect, rtol=1e-5)


@pytest.mark.slow
class TestSparseControlNetParity:
    def test_residuals_match(self):
        from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
        from neurons_tpu.interop.torch_import import import_sparse_controlnet

        tm = TSparseControlNet(TINY_3D).eval()
        params, unused = import_sparse_controlnet(tm.state_dict(), TINY_3D)
        assert unused == [], unused

        f = 4
        jm = SparseControlNetModel(TINY_3D, n_frames=f)
        rs = np.random.RandomState(0)
        x = rs.randn(2, 4, f, 8, 8).astype(np.float32)
        t = np.array([5.0, 9.0], np.float32)
        ctx = rs.randn(2, 5, 12).astype(np.float32)
        cond = rs.randn(2, 4, f, 8, 8).astype(np.float32)
        mask = (rs.rand(2, 1, f, 8, 8) > 0.5).astype(np.float32)
        with torch.no_grad():
            ref_down, ref_mid = tm(torch.tensor(x), torch.tensor(t),
                                   torch.tensor(ctx), torch.tensor(cond),
                                   torch.tensor(mask), scale=0.7)
        got_down, got_mid = jm.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(ctx), jnp.asarray(cond), jnp.asarray(mask), 0.7)
        assert len(got_down) == len(ref_down)
        for g_r, r_r in zip(got_down, ref_down):
            # ours is folded NHWC; torch fixture is folded NCHW
            np.testing.assert_allclose(
                np.asarray(g_r), r_r.numpy().transpose(0, 2, 3, 1),
                rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(got_mid), ref_mid.numpy().transpose(0, 2, 3, 1),
            rtol=5e-4, atol=5e-4)


class TestAnimateDiffUNet3DParity:
    def test_forward_matches_with_motion(self):
        from neurons_tpu.models.unet3d import UNet3DModel

        tm = TDiffusersUNet3D(TINY_3D).eval()
        sd = tm.state_dict()
        spatial_sd = {k: v for k, v in sd.items()
                      if "motion_modules." not in k}
        motion_sd = TI.filter_motion_module(sd)
        params, unused = TI.import_animatediff_unet3d(spatial_sd, TINY_3D)
        assert unused == [], unused
        params, mm_unused = TI.import_motion_modules(motion_sd, TINY_3D,
                                                     params)
        assert mm_unused == [], mm_unused

        f = 4
        jm = UNet3DModel(TINY_3D, n_frames=f)
        x = np.random.RandomState(0).randn(2, 4, f, 8, 8).astype(np.float32)
        t = np.array([3.0, 11.0], np.float32)
        ctx = np.random.RandomState(1).randn(2, 5, 12).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x), torch.tensor(t),
                     torch.tensor(ctx)).numpy()
        got = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                       jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)
