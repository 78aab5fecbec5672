"""Torch replica of the dalle2-pytorch DiffusionPriorNetwork the reference
vendors (reference model_variants/BrainModel_neurons.py:484-686 subclasses
dalle2-pytorch 1.15.6's PriorNetwork/FlaggedCausalTransformer; the library
is an external unvendored dependency, so this replica is written in plain
torch from the same public design). Its state_dict reproduces the
reference checkpoint key layout exactly, so it drives the real importer
(`interop.torch_import._dalle2_prior_net`) in the golden tests.

Scope caveat (same as the rest of the no-egress parity fallback): this
validates importer key mapping + flax-vs-torch numerics of OUR
architectural reading of the prior; true dalle2 golden tensors would
need the pinned library, which is not installable offline.
"""

import math

import torch
import torch.nn as nn


class GainLN(nn.Module):
    """dalle2 LayerNorm: gain only, optional stable (divide by amax)."""

    def __init__(self, d, stable=False, eps=1e-5):
        super().__init__()
        self.g = nn.Parameter(torch.ones(d))
        self.stable = stable
        self.eps = eps

    def forward(self, x):
        if self.stable:
            x = x / x.abs().amax(dim=-1, keepdim=True).clamp(min=self.eps)
        mean = x.mean(-1, keepdim=True)
        var = x.var(-1, keepdim=True, unbiased=False)
        return (x - mean) * torch.rsqrt(var + self.eps) * self.g


class SinPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, t):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([args.sin(), args.cos()], dim=-1)


class _TimeMLP(nn.Module):
    """MLP(dim, dim) at dalle2 defaults: expansion 2, depth 2 — key layout
    net.0.0 / net.1.0 / net.2 (Sequential of (Linear,SiLU) pairs)."""

    def __init__(self, d):
        super().__init__()
        h = 2 * d
        self.net = nn.Sequential(
            nn.Sequential(nn.Linear(d, h), nn.SiLU()),
            nn.Sequential(nn.Linear(h, h), nn.SiLU()),
            nn.Linear(h, d))

    def forward(self, x):
        return self.net(x)


def _rotate_half(x):
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return torch.cat([-x2, x1], dim=-1)


def _rotary(seq_len, dim):
    inv = 1.0 / (10000 ** (torch.arange(0, dim, 2, dtype=torch.float32)
                           / dim))
    t = torch.arange(seq_len, dtype=torch.float32)
    freqs = torch.einsum("i,j->ij", t, inv)
    return torch.cat([freqs, freqs], dim=-1)           # [seq, dim]


def _apply_rotary(pos, t):
    rd = pos.shape[-1]
    t_rot, t_pass = t[..., :rd], t[..., rd:]
    t_rot = t_rot * pos.cos() + _rotate_half(t_rot) * pos.sin()
    return torch.cat([t_rot, t_pass], dim=-1)


class RelPosBias(nn.Module):
    """T5-style causal-bucketed relative position bias."""

    def __init__(self, heads, num_buckets=32, max_distance=128):
        super().__init__()
        self.relative_attention_bias = nn.Embedding(num_buckets, heads)
        self.num_buckets = num_buckets
        self.max_distance = max_distance

    def forward(self, qlen, klen):
        q_pos = torch.arange(qlen)[:, None]
        k_pos = torch.arange(klen)[None, :]
        rel = k_pos - q_pos
        n = (-rel).clamp(min=0)
        max_exact = self.num_buckets // 2
        val_large = max_exact + (
            torch.log(n.clamp(min=1).float() / max_exact)
            / math.log(self.max_distance / max_exact)
            * (self.num_buckets - max_exact)).to(torch.int64)
        val_large = val_large.clamp(max=self.num_buckets - 1)
        buckets = torch.where(n < max_exact, n, val_large)
        values = self.relative_attention_bias(buckets)  # [q, k, h]
        return values.permute(2, 0, 1)                  # [h, q, k]


class MQAttention(nn.Module):
    """Multi-head Q / single-head KV with learned null KV and rotary on
    the first min(32, dim_head) dims (keys: norm.g, null_kv, to_q, to_kv,
    to_out.0, to_out.1.g)."""

    def __init__(self, d, dim_head, heads, rotary_dim=32):
        super().__init__()
        inner = dim_head * heads
        self.heads, self.dim_head = heads, dim_head
        self.rotary_dim = min(rotary_dim, dim_head)
        self.norm = GainLN(d)
        self.null_kv = nn.Parameter(torch.randn(2, dim_head))
        self.to_q = nn.Linear(d, inner, bias=False)
        self.to_kv = nn.Linear(d, dim_head * 2, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, d, bias=False),
                                    GainLN(d))

    def forward(self, x, bias):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        x = self.norm(x)
        q = self.to_q(x).view(b, n, h, dh).transpose(1, 2)
        k, v = self.to_kv(x).chunk(2, dim=-1)           # [b, n, dh]
        q = q * dh ** -0.5
        rot = _rotary(n, self.rotary_dim)
        q = _apply_rotary(rot[None, None], q)
        k = _apply_rotary(rot[None], k)
        nk = self.null_kv[0].expand(b, 1, dh)
        nv = self.null_kv[1].expand(b, 1, dh)
        k = torch.cat([nk, k], dim=1)                   # [b, n+1, dh]
        v = torch.cat([nv, v], dim=1)
        sim = torch.einsum("bhid,bjd->bhij", q, k) + bias[None]
        out = torch.einsum("bhij,bjd->bhid", sim.softmax(-1), v)
        return self.to_out(out.transpose(1, 2).reshape(b, n, h * dh))


class _SwiGLU(nn.Module):
    def forward(self, x):
        val, gate = x.chunk(2, dim=-1)
        return val * torch.nn.functional.silu(gate)


def _ff(d, mult):
    """FF key layout .0 (norm) .1 (proj_in) .5 (proj_out)."""
    return nn.Sequential(GainLN(d), nn.Linear(d, 2 * d * mult, bias=False),
                         _SwiGLU(), nn.Identity(), nn.Dropout(0.0),
                         nn.Linear(d * mult, d, bias=False))


class CausalTransformer(nn.Module):
    """The FlaggedCausalTransformer at the reference's causal=False
    setting: pre-norm attn/ff residual pairs, shared rel-pos bias,
    stable output norm, final projection."""

    def __init__(self, d, depth, dim_head, heads, ff_mult):
        super().__init__()
        self.rel_pos_bias = RelPosBias(heads)
        self.layers = nn.ModuleList([
            nn.ModuleList([MQAttention(d, dim_head, heads),
                           _ff(d, ff_mult)]) for _ in range(depth)])
        self.norm = GainLN(d, stable=True)
        self.project_out = nn.Linear(d, d, bias=False)

    def forward(self, x):
        n = x.shape[1]
        bias = self.rel_pos_bias(n, n + 1)
        for attn, ff in self.layers:
            x = attn(x, bias) + x
            x = ff(x) + x
        return self.project_out(self.norm(x))


class TorchPriorNetwork(nn.Module):
    """Token layout [brain (N) | time (1) | image (N) + learned_query],
    prediction read from the last N positions. Deterministic forward
    (cond-drop paths replaced by explicit null-embed substitution)."""

    def __init__(self, cfg):
        super().__init__()
        d, nt = cfg.dim, cfg.num_tokens
        self.num_tokens = nt
        self.null_brain_embeds = nn.Parameter(torch.randn(nt, d))
        self.null_image_embed = nn.Parameter(torch.randn(nt, d))
        self.learned_query = nn.Parameter(torch.randn(nt, d) * d ** -0.5)
        self.to_time_embeds = nn.Sequential(
            nn.Sequential(SinPosEmb(d), _TimeMLP(d)))
        self.causal_transformer = CausalTransformer(
            d, cfg.depth, cfg.dim_head, cfg.heads, cfg.ff_mult)

    def forward(self, image_embed, times, brain_embed,
                drop_brain=False, drop_image=False):
        b = image_embed.shape[0]
        if drop_brain:
            brain_embed = self.null_brain_embeds[None].expand(b, -1, -1)
        if drop_image:
            image_embed = self.null_image_embed[None].expand(b, -1, -1)
        t_emb = self.to_time_embeds(times)[:, None]
        image_embed = image_embed + self.learned_query[None]
        tokens = torch.cat([brain_embed, t_emb, image_embed], dim=1)
        out = self.causal_transformer(tokens)
        return out[:, -self.num_tokens:]
