"""BLIP-2 (OPT) captioner — the reference's stage 4.

Re-design of the HF `Blip2ForConditionalGeneration` inference path the
reference uses to caption reconstructed keyframes (reference
caption_keyframe.py:23-48, pinned `Salesforce/blip2-opt-2.7b`): frozen
EVA-CLIP ViT-g vision tower -> Q-Former (32 learned queries, BERT-style
post-norm blocks with cross-attention every second layer) -> linear
projection into the OPT-2.7B embedding space -> greedy LM decode.

TPU notes: all three towers are plain transformer stacks that jit
trivially; the greedy decode is a fixed-length `lax.scan` (no dynamic
shapes) over a preallocated per-layer KV cache — one prefill forward
over [prefix ‖ BOS], then max_len-1 single-token steps that
`dynamic_update_slice` their K/V into the cache. The cacheless
full-recompute variant (`generate_nocache`) is kept as the parity
oracle: r3's full-recompute decode re-ran the whole 2.7B OPT forward
per token (30 x 62-token forwards), which dominated stage-4 wall time
at 1200-clip scale. Weights import from the HF checkpoint via
interop.torch_import.import_blip2.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class Blip2VisionConfig:
    hidden_size: int = 1408
    layers: int = 39
    heads: int = 16
    intermediate_size: int = 6144
    patch_size: int = 14
    image_size: int = 224


@dataclass(frozen=True)
class Blip2QFormerConfig:
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    intermediate_size: int = 3072
    cross_attention_frequency: int = 2
    num_query_tokens: int = 32


@dataclass(frozen=True)
class OPTConfig:
    hidden_size: int = 2560
    layers: int = 32
    heads: int = 32
    ffn_dim: int = 10240
    vocab_size: int = 50272
    max_position_embeddings: int = 2048
    bos_token_id: int = 2
    eos_token_id: int = 50118  # '\n' — HF blip2 generation stop


@dataclass(frozen=True)
class Blip2Config:
    vision: Blip2VisionConfig = field(default_factory=Blip2VisionConfig)
    qformer: Blip2QFormerConfig = field(default_factory=Blip2QFormerConfig)
    opt: OPTConfig = field(default_factory=OPTConfig)

    @staticmethod
    def tiny() -> "Blip2Config":
        return Blip2Config(
            vision=Blip2VisionConfig(hidden_size=32, layers=2, heads=4,
                                     intermediate_size=64, patch_size=8,
                                     image_size=32),
            qformer=Blip2QFormerConfig(hidden_size=24, layers=2, heads=4,
                                       intermediate_size=48,
                                       num_query_tokens=4),
            opt=OPTConfig(hidden_size=40, layers=2, heads=4, ffn_dim=80,
                          vocab_size=100, max_position_embeddings=64,
                          # the real 50118 EOS is out-of-vocab at 100:
                          # jnp.take would gather NaN fill values for the
                          # post-EOS placeholder embeddings
                          eos_token_id=99))


def _mha(q, k, v, heads, mask=None):
    b, tq, d = q.shape
    hd = d // heads

    def split(y):
        return y.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    out = dot_product_attention(split(q), split(k), split(v), mask=mask)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, d)


class Blip2VisionLayer(nn.Module):
    """HF Blip2EncoderLayer: pre-norm attn (fused qkv) + pre-norm MLP."""

    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + nn.Dense(d, name="projection")(_mha(q, k, v, self.heads))
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm2")(x)
        h = nn.gelu(nn.Dense(self.intermediate, name="fc1")(h),
                    approximate=False)
        return x + nn.Dense(d, name="fc2")(h)


class Blip2VisionModel(nn.Module):
    """Images [B, 3, H, W] (BLIP-normalized) -> tokens [B, N+1, D]."""

    cfg: Blip2VisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x.transpose(0, 2, 3, 1)
        h = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=c.patch_size, use_bias=True,
                    name="patch_embed")(x)
        b, gh, gw, d = h.shape
        tokens = h.reshape(b, gh * gw, d)
        cls = self.param("class_embedding", nn.initializers.zeros, (d,))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, d)), tokens], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         ((c.image_size // c.patch_size) ** 2 + 1, d))
        tokens = tokens + pos[None, : tokens.shape[1]]
        for i in range(c.layers):
            tokens = Blip2VisionLayer(c.heads, c.intermediate_size,
                                      name=f"layer_{i}")(tokens)
        return nn.LayerNorm(epsilon=1e-6, name="post_layernorm")(tokens)


class QFormerAttention(nn.Module):
    """BERT-style post-norm attention: out = LN(dense(attn) + residual)."""

    heads: int

    @nn.compact
    def __call__(self, x, kv):
        d = x.shape[-1]
        q = nn.Dense(d, name="query")(x)
        k = nn.Dense(d, name="key")(kv)
        v = nn.Dense(d, name="value")(kv)
        h = nn.Dense(d, name="out_dense")(_mha(q, k, v, self.heads))
        return nn.LayerNorm(epsilon=1e-12, name="out_ln")(h + x)


class QFormerLayer(nn.Module):
    heads: int
    intermediate: int
    has_cross: bool

    @nn.compact
    def __call__(self, x, image_embeds):
        x = QFormerAttention(self.heads, name="attention")(x, x)
        if self.has_cross:
            x = QFormerAttention(self.heads, name="crossattention")(
                x, image_embeds)
        h = nn.gelu(nn.Dense(self.intermediate, name="intermediate_query")(x),
                    approximate=False)
        h = nn.Dense(x.shape[-1], name="output_query")(h)
        return nn.LayerNorm(epsilon=1e-12, name="output_ln")(h + x)


class Blip2QFormer(nn.Module):
    """Query tokens [B, Q, D] x image tokens -> query outputs [B, Q, D].
    Caption path only (no text input), reference uses it frozen."""

    cfg: Blip2QFormerConfig

    @nn.compact
    def __call__(self, query_tokens, image_embeds):
        c = self.cfg
        x = nn.LayerNorm(epsilon=1e-12, name="layernorm")(query_tokens)
        for i in range(c.layers):
            x = QFormerLayer(c.heads, c.intermediate_size,
                             has_cross=(i % c.cross_attention_frequency == 0),
                             name=f"layer_{i}")(x, image_embeds)
        return x


class OPTDecoderLayer(nn.Module):
    """OPT-2.7b layer (do_layer_norm_before=True): pre-norm attn,
    pre-norm ReLU FFN.

    With `cache=(k_cache, v_cache)` ([B, T_total, D] each) and an int32
    write `index`, the chunk's K/V is written at [index, index+t) and
    attention runs over the whole cache (the caller's mask must exclude
    unwritten slots — they hold zeros); returns (x, new_cache)."""

    heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x, mask, cache=None, index=None):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        q = nn.Dense(d, name="q_proj")(h)
        k = nn.Dense(d, name="k_proj")(h)
        v = nn.Dense(d, name="v_proj")(h)
        if cache is not None:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, index, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, index, 0))
            k, v, cache = ck, cv, (ck, cv)
        x = x + nn.Dense(d, name="out_proj")(_mha(q, k, v, self.heads,
                                                  mask=mask))
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = nn.relu(nn.Dense(self.ffn_dim, name="fc1")(h))
        x = x + nn.Dense(d, name="fc2")(h)
        return x if cache is None else (x, cache)


class OPTModel(nn.Module):
    """inputs_embeds [B, T, D] + attention mask [B, T] -> logits [B, T, V].
    Positions follow the OPT convention: cumsum(mask) - 1 + offset 2."""

    cfg: OPTConfig

    @nn.compact
    def __call__(self, inputs_embeds, attn_mask, cache=None, index=None):
        c = self.cfg
        b, t, d = inputs_embeds.shape
        wpe = self.param("embed_positions", nn.initializers.normal(0.02),
                         (c.max_position_embeddings + 2, d))
        if cache is None:
            positions = jnp.cumsum(attn_mask, axis=1) - 1
            positions = jnp.clip(positions, 0, None).astype(jnp.int32)
            causal = jnp.tril(jnp.ones((t, t), bool))
            mask = (causal[None, None]
                    & attn_mask[:, None, None, :].astype(bool))
        else:
            # cached decode (greedy generate): all slots up to `index`
            # are real tokens (mask-of-ones semantics), so the absolute
            # slot IS the OPT position; keys beyond the chunk's causal
            # frontier are unwritten zeros and must stay masked out
            t_cache = cache[0][0].shape[1]
            positions = jnp.broadcast_to(
                (index + jnp.arange(t, dtype=jnp.int32))[None], (b, t))
            mask = (jnp.arange(t_cache)[None, :]
                    <= (index + jnp.arange(t))[:, None])[None, None]
        x = inputs_embeds + jnp.take(jnp.asarray(wpe), positions + 2, axis=0)
        new_cache = []
        for i in range(c.layers):
            layer = OPTDecoderLayer(c.heads, c.ffn_dim, name=f"layer_{i}")
            if cache is None:
                x = layer(x, mask)
            else:
                x, lc = layer(x, mask, cache=cache[i], index=index)
                new_cache.append(lc)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        return x if cache is None else (x, tuple(new_cache))


class Blip2Captioner(nn.Module):
    """Full stage-4 model. `__call__` returns LM logits for teacher-forced
    tokens (parity testing); `generate` greedy-decodes captions."""

    cfg: Blip2Config

    def setup(self):
        self.vision_model = Blip2VisionModel(self.cfg.vision)
        self.qformer = Blip2QFormer(self.cfg.qformer)
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, self.cfg.qformer.num_query_tokens,
             self.cfg.qformer.hidden_size))
        self.language_projection = nn.Dense(self.cfg.opt.hidden_size,
                                            name="language_projection")
        self.embed_tokens = self.param(
            "embed_tokens", nn.initializers.normal(0.02),
            (self.cfg.opt.vocab_size, self.cfg.opt.hidden_size))
        self.lm = OPTModel(self.cfg.opt)

    def _prefix(self, images):
        image_embeds = self.vision_model(images)
        q = jnp.broadcast_to(self.query_tokens,
                             (images.shape[0],) + self.query_tokens.shape[1:])
        query_out = self.qformer(q, image_embeds)
        return self.language_projection(query_out)

    def __call__(self, images, input_ids):
        """images [B, 3, H, W], input_ids [B, T] -> logits [B, Q+T, V]."""
        prefix = self._prefix(images)
        tok = jnp.take(jnp.asarray(self.embed_tokens), input_ids, axis=0)
        x = jnp.concatenate([prefix, tok], axis=1)
        mask = jnp.ones(x.shape[:2], jnp.int32)
        h = self.lm(x, mask)
        return h @ jnp.asarray(self.embed_tokens).T

    def generate(self, images, max_len: int = 30):
        """Greedy caption token ids [B, max_len] (BOS prompt; positions
        after EOS repeat EOS — the reference decodes with HF generate(),
        same greedy semantics, caption_keyframe.py:23-48).

        KV-cached: one prefill forward over [prefix ‖ BOS] fills
        per-layer [B, nq+max_len, D] caches, then a fixed-length
        `lax.scan` decodes one token per step. Token-exact vs
        `generate_nocache` (masked softmax ignores unwritten cache
        slots); pinned by tests/test_blip2.py."""
        c = self.cfg.opt
        prefix = self._prefix(images)
        b = images.shape[0]
        nq = prefix.shape[1]
        d = prefix.shape[-1]
        dt = prefix.dtype
        t_total = nq + max_len
        emb = jnp.asarray(self.embed_tokens)
        cache0 = tuple((jnp.zeros((b, t_total, d), dt),
                        jnp.zeros((b, t_total, d), dt))
                       for _ in range(c.layers))

        # prefill = original loop's i=0 step: predict token slot 1
        bos = jnp.full((b, 1), c.bos_token_id, jnp.int32)
        x0 = jnp.concatenate([prefix, jnp.take(emb, bos[:, 0], axis=0)
                              [:, None]], axis=1)
        h, cache = self.lm(x0, None, cache=cache0, index=0)
        nxt = jnp.argmax(h[:, -1] @ emb.T, axis=-1).astype(jnp.int32)
        done = nxt == c.eos_token_id
        tokens0 = jnp.full((b, max_len), c.eos_token_id, jnp.int32)
        tokens0 = tokens0.at[:, 0].set(c.bos_token_id)
        if max_len == 1:
            return tokens0
        tokens0 = tokens0.at[:, 1].set(nxt)

        def step(carry, i):
            tokens, done, cache, cur = carry
            x = jnp.take(emb, cur, axis=0)[:, None]
            h, cache = self.lm(x, None, cache=cache, index=nq + i)
            logits = h[:, 0] @ emb.T
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_token_id, nxt)
            done = done | (nxt == c.eos_token_id)
            tokens = jax.lax.cond(
                i + 1 < max_len,
                lambda t: t.at[:, i + 1].set(nxt),
                lambda t: t, tokens)
            return (tokens, done, cache, nxt), None

        (tokens, _, _, _), _ = jax.lax.scan(
            step, (tokens0, done, cache, nxt), jnp.arange(1, max_len))
        return tokens

    def generate_nocache(self, images, max_len: int = 30):
        """r3's full-recompute greedy decode (the whole [prefix ‖ tokens]
        forward per step) — kept as the cached path's parity oracle."""
        c = self.cfg.opt
        prefix = self._prefix(images)
        b = images.shape[0]
        nq = prefix.shape[1]
        tokens0 = jnp.full((b, max_len), c.eos_token_id, jnp.int32)
        tokens0 = tokens0.at[:, 0].set(c.bos_token_id)
        done0 = jnp.zeros((b,), bool)

        def step(carry, i):
            tokens, done = carry
            tok = jnp.take(jnp.asarray(self.embed_tokens), tokens, axis=0)
            x = jnp.concatenate([prefix, tok], axis=1)
            mask = jnp.concatenate(
                [jnp.ones((b, nq), jnp.int32),
                 (jnp.arange(max_len)[None] <= i).astype(jnp.int32)
                 * jnp.ones((b, 1), jnp.int32)], axis=1)
            h = self.lm(x, mask)
            logits = h[:, nq + i] @ jnp.asarray(self.embed_tokens).T
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_token_id, nxt)
            done = done | (nxt == c.eos_token_id)
            tokens = jax.lax.cond(
                i + 1 < max_len,
                lambda t: t.at[:, i + 1].set(nxt),
                lambda t: t, tokens)
            return (tokens, done), None

        (tokens, _), _ = jax.lax.scan(step, (tokens0, done0),
                                      jnp.arange(max_len))
        return tokens
