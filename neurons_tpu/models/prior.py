"""Diffusion-prior network: brain tokens -> denoised CLIP image tokens.

Re-derivation of the dalle2-pytorch (1.15.6) prior stack that the reference
subclasses (reference model_variants/BrainModel_neurons.py:484-686 and
train_neurons.py:157-182; the library itself is an external, unvendored
dependency, so the architecture is rebuilt from its public design):

  PriorNetwork             — token sequence [brain(256) | time(1) | image(256)]
                             with `pos_emb` learned queries and null-embed CFG
                             masking (reference :540-633)
  PriorTransformer         — the "FlaggedCausalTransformer": pre-norm blocks of
                             multi-query attention (single-head K/V + learned
                             null KV) with rotary embedding on the first
                             min(32, dim_head) dims and a T5-style relative
                             position bias, SwiGLU feed-forward, stable-norm
                             output + final projection (reference :636-686)

TPU notes: sequence length is 513 and dim 1664, so the whole transformer is
MXU-friendly dense matmuls under one jit; the 100-step DDPM sampling loop
lives in diffusion/prior_sampling.py as a `lax.scan`. Attention here uses
the XLA path (it carries an additive rel-pos bias; at 513 tokens flash
tiling buys nothing).

NOTE on checkpoint parity: layer factoring (to_q/to_kv splits, null-kv
params, gain-only LayerNorms) mirrors dalle2-pytorch so torch checkpoints
map 1:1; numerical parity vs the exact pinned version (1.15.6) is validated
by the importer's golden-tensor tests, not assumed.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.config import PriorConfig
from neurons_tpu.ops.attention import xla_attention


class GainLayerNorm(nn.Module):
    """dalle2-style LayerNorm: gain only (no bias), optional stable mode
    (divide by amax first)."""

    stable: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        if self.stable:
            x = x / jnp.maximum(
                jax.lax.stop_gradient(jnp.max(jnp.abs(x), axis=-1, keepdims=True)),
                self.eps)
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * g


class SinusoidalPosEmb(nn.Module):
    dim: int

    def __call__(self, t):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        freqs = jnp.exp(jnp.arange(half) * -emb)
        args = t[:, None].astype(jnp.float32) * freqs[None]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeMLP(nn.Module):
    """dalle2 MLP(dim_in, dim_out) at its default depth=2, expansion 2:
    Linear(in,h) -> SiLU -> Linear(h,h) -> SiLU -> Linear(h,out) — three
    linears, matching the reference prior's continuous time embedder
    (reference BrainModel_neurons.py:503-506 to_time_embeds)."""

    dim_out: int
    expansion: float = 2.0

    @nn.compact
    def __call__(self, x):
        hidden = int(self.expansion * self.dim_out)
        x = nn.silu(nn.Dense(hidden)(x))
        x = nn.silu(nn.Dense(hidden)(x))
        return nn.Dense(self.dim_out)(x)


class RelPosBias(nn.Module):
    """T5-style relative position bias, causal bucketing (dalle2 RelPosBias):
    future keys share bucket 0; past distances bucket log-scaled."""

    heads: int
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, qlen: int, klen: int):
        table = self.param("rel_bias", nn.initializers.normal(1.0),
                           (self.num_buckets, self.heads))
        return rel_pos_bias_from_table(table, qlen, klen, self.num_buckets,
                                       self.max_distance)


def _rel_pos_bucket(rel_pos, num_buckets: int, max_distance: int):
    n = jnp.maximum(-rel_pos, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return jnp.where(is_small, n, val_large)


def rel_pos_bias_from_table(table: jax.Array, qlen: int, klen: int,
                            num_buckets: int = 32,
                            max_distance: int = 128) -> jax.Array:
    """[num_buckets, H] table -> [H, qlen, klen] bias. Pure function so the
    (step-invariant) bias can be hoisted out of the 100-step prior scan —
    XLA declines to LICM the 17 MB gather, costing ~0.4 ms/step otherwise
    (profiled on v5e). See `prior_attn_bias`."""
    q_pos = jnp.arange(qlen)[:, None]
    k_pos = jnp.arange(klen)[None, :]
    buckets = _rel_pos_bucket(k_pos - q_pos, num_buckets, max_distance)
    values = jnp.take(jnp.asarray(table), buckets, axis=0)  # [q, k, h]
    return jnp.transpose(values, (2, 0, 1))       # [h, q, k]


def prior_attn_bias(params, num_image_tokens: int, num_buckets: int = 32,
                    max_distance: int = 128) -> jax.Array:
    """Precompute the PriorTransformer rel-pos bias from a PriorNetwork
    param tree (params['transformer']['rel_pos_bias']['rel_bias']). The
    token count is 2*N + 1 (brain ++ time ++ image, reference
    BrainModel_neurons.py:618-623); keys gain the learned null token."""
    n = 2 * num_image_tokens + 1
    table = params["transformer"]["rel_pos_bias"]["rel_bias"]
    return rel_pos_bias_from_table(table, n, n + 1, num_buckets,
                                   max_distance)


def _rotate_half(x):
    # '... (j d) -> ... j d', j=2 split; (-x2, x1) concat
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(pos: jax.Array, t: jax.Array) -> jax.Array:
    """Apply rotary embedding to the first pos.shape[-1] dims of t."""
    rot_dim = pos.shape[-1]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    # cos/sin evaluated on f32 angles, applied in the activation dtype
    # (an f32 rotary would promote the whole bf16 attention to f32)
    cos = jnp.cos(pos).astype(t.dtype)
    sin = jnp.sin(pos).astype(t.dtype)
    t_rot = t_rot * cos + _rotate_half(t_rot) * sin
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def rotary_freqs(seq_len: int, dim: int) -> jax.Array:
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)  # [seq, dim]


class MultiQueryAttention(nn.Module):
    """dalle2 Attention: multi-head Q, single-head K/V (multi-query), learned
    null KV token for CFG, rotary on first min(32, dim_head) dims, additive
    rel-pos bias, optional causal mask."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    rotary_dim: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_bias: Optional[jax.Array] = None,
                 deterministic: bool = True):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        x = GainLayerNorm(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(self.dim_head * 2, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)              # [b, n, dh]

        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        scale = self.dim_head ** -0.5
        q = q * scale

        rot = rotary_freqs(n, min(self.rotary_dim, self.dim_head))
        q = apply_rotary(rot[None, None], q)
        k = apply_rotary(rot[None], k)

        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head))
        nk = jnp.broadcast_to(null_kv[0], (b, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, 1, self.dim_head))
        k = jnp.concatenate([nk, k], axis=1)          # [b, n+1, dh]
        v = jnp.concatenate([nv, v], axis=1)

        if not self.causal and (deterministic or self.dropout == 0.0):
            # dispatcher path: on TPU this takes the bias-capable whole-KV
            # flash kernel (ops/attention.py) for the 513-token rows. K/V
            # pass UNBROADCAST as [b, 1, n+1, dh] — the kernels are
            # multi-query-aware (the shared kv row is read via the index
            # map; XLA fuses the broadcast on its paths), so the [b, h,
            # n+1, dh] copy is never materialized
            from neurons_tpu.ops.attention import dot_product_attention
            out = dot_product_attention(q, k[:, None], v[:, None],
                                        bias=attn_bias,
                                        scale=1.0)  # q is pre-scaled
        else:
            # logits [b, h, n, n+1]; K/V broadcast across heads (multi-query)
            sim = jnp.einsum("bhid,bjd->bhij", q, k,
                             preferred_element_type=jnp.float32)
            if attn_bias is not None:
                sim = sim + attn_bias[None]
            if self.causal:
                i = jnp.arange(n)[:, None]
                j = jnp.arange(n + 1)[None, :]
                causal_mask = j > (i + 1)  # null token (j=0) always visible
                sim = jnp.where(causal_mask[None, None], -1e30, sim)
            attn = jax.nn.softmax(sim, axis=-1)
            attn = nn.Dropout(self.dropout,
                              deterministic=deterministic)(attn)
            out = jnp.einsum("bhij,bjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return GainLayerNorm(name="out_norm")(out)


class SwiGLUFeedForward(nn.Module):
    """dalle2 FeedForward: LN -> Dense(2*inner, no bias) -> SwiGLU ->
    Dropout -> Dense(dim, no bias)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        x = GainLayerNorm(name="norm")(x)
        x = nn.Dense(inner * 2, use_bias=False, name="proj_in")(x)
        val, gate = jnp.split(x, 2, axis=-1)
        x = val * nn.silu(gate)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.dim, use_bias=False, name="proj_out")(x)


class PriorTransformer(nn.Module):
    """The FlaggedCausalTransformer (reference :636-686): depth pre-norm
    attention/FF residual blocks with shared rel-pos bias, stable output
    norm, final linear projection."""

    cfg: PriorConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, attn_bias=None):
        c = self.cfg
        n = x.shape[1]
        if attn_bias is None:
            attn_bias = RelPosBias(heads=c.heads, name="rel_pos_bias")(
                n, n + 1)
        for i in range(c.depth):
            x = MultiQueryAttention(
                dim=c.dim, dim_head=c.dim_head, heads=c.heads,
                causal=c.causal, name=f"attn_{i}")(
                    x, attn_bias=attn_bias, deterministic=deterministic) + x
            x = SwiGLUFeedForward(dim=c.dim, mult=c.ff_mult,
                                  name=f"ff_{i}")(
                                      x, deterministic=deterministic) + x
        x = GainLayerNorm(stable=True, name="norm_out")(x)
        return nn.Dense(c.dim, use_bias=False, name="project_out")(x)


class PriorNetwork(nn.Module):
    """Denoiser over CLIP image tokens conditioned on brain tokens
    (reference :484-633, config train_neurons.py:159-173: depth 6,
    dim_head 52, heads 32, 256 tokens, learned_query_mode='pos_emb').

    Token layout: [brain_embed (N) | time_embed (1) | image_embed (N)], and
    the prediction is read from the last N positions (reference :618-631).
    CFG drops brain/image conditioning to learned null embeddings; the drop
    masks are Bernoulli per batch element (reference prob_mask_like).
    """

    cfg: PriorConfig

    @nn.compact
    def __call__(self, image_embed: jax.Array, times: jax.Array,
                 brain_embed: jax.Array,
                 brain_cond_drop_prob: float = 0.0,
                 image_cond_drop_prob: float = 0.0,
                 rng: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 attn_bias: Optional[jax.Array] = None) -> jax.Array:
        c = self.cfg
        b, n, d = image_embed.shape
        assert n == c.num_tokens and d == c.dim

        null_brain = self.param("null_brain_embeds",
                                nn.initializers.normal(1.0), (c.num_tokens, c.dim))
        null_image = self.param("null_image_embed",
                                nn.initializers.normal(1.0), (c.num_tokens, c.dim))

        def keep_mask(prob, key):
            if prob == 0.0:
                return jnp.ones((b, 1, 1), bool)
            if prob == 1.0:
                return jnp.zeros((b, 1, 1), bool)
            assert key is not None, "rng required for fractional cond drop"
            return (jax.random.uniform(key, (b, 1, 1)) >= prob)

        if rng is not None:
            rb, ri = jax.random.split(rng)
        else:
            rb = ri = None
        brain_embed = jnp.where(keep_mask(brain_cond_drop_prob, rb),
                                brain_embed, null_brain[None])
        image_embed = jnp.where(keep_mask(image_cond_drop_prob, ri),
                                image_embed, null_image[None])

        time_embed = TimeMLP(c.dim, name="time_mlp")(
            SinusoidalPosEmb(c.dim)(times.astype(jnp.float32)))[:, None]
        # keep the f32 sinusoid from promoting the bf16 transformer
        time_embed = time_embed.astype(image_embed.dtype)

        # pos_emb learned-query mode: add learned positional embedding to the
        # image tokens (reference :608-611)
        scale = c.dim ** -0.5
        learned_query = self.param("learned_query",
                                   nn.initializers.normal(scale),
                                   (c.num_tokens, c.dim))
        image_embed = image_embed + learned_query[None]

        tokens = jnp.concatenate([brain_embed, time_embed, image_embed], axis=1)
        tokens = PriorTransformer(c, name="transformer")(
            tokens, deterministic=deterministic, attn_bias=attn_bias)
        return tokens[:, -c.num_tokens:]

    def forward_with_cond_scale(self, image_embed, times, brain_embed,
                                cond_scale: float = 1.0,
                                deterministic: bool = True):
        """CFG combination (reference :526-538). Call via nn.apply with
        method=... or use prior_sampling helpers."""
        logits = self(image_embed, times, brain_embed,
                      deterministic=deterministic)
        if cond_scale == 1.0:
            return logits
        null_logits = self(image_embed, times, brain_embed,
                           brain_cond_drop_prob=1.0, image_cond_drop_prob=1.0,
                           deterministic=deterministic)
        return null_logits + (logits - null_logits) * cond_scale
