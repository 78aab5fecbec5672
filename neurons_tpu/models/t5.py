"""T5 v1.1 text encoder — the sgm FrozenT5Embedder/FrozenByT5Embedder
equivalent, flax.

Re-design of the reference's T5 conditioners (reference
generative_models/sgm/modules/encoders/modules.py:249-341
FrozenT5Embedder / FrozenByT5Embedder — both wrap HF `T5EncoderModel`;
the reference only runs them frozen for text conditioning). Architecture
follows T5 v1.1: RMSNorm pre-norm, no attention scaling (T5 folds the
1/sqrt(d) into init), bucketed relative position bias shared from block 0,
gated-GELU feed-forward, all linears bias-free.

The T5 SentencePiece tokenizer needs its .model file — callers pass
pre-tokenized ids (or use HF's tokenizer host-side). ByT5 needs no files:
`byt5_tokenize` implements the byte→id scheme (utf-8 byte + 3, eos 1,
pad 0) exactly.

TPU notes: the encoder is one jittable stack of matmuls — bf16-friendly
and trivially batched; the relative-position bias is a static [H, T, T]
table computed once per sequence length.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class T5Config(NamedTuple):
    vocab_size: int = 32128
    d_model: int = 4096  # t5-v1_1-xxl
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


def t5_v1_1_xxl() -> T5Config:
    return T5Config()


def byt5_base() -> T5Config:
    return T5Config(vocab_size=384, d_model=1536, d_kv=64, d_ff=3968,
                    num_layers=12, num_heads=12)


def byt5_tokenize(texts: List[str], max_length: int = 77) -> np.ndarray:
    """ByT5 byte tokenizer: id = utf8 byte + 3, eos 1, pad 0 (HF
    ByT5Tokenizer semantics; reference modules.py:303-341 feeds these to
    the same T5 encoder)."""
    out = np.zeros((len(texts), max_length), np.int32)
    for i, t in enumerate(texts):
        ids = [b + 3 for b in t.encode("utf-8")][: max_length - 1] + [1]
        out[i, : len(ids)] = ids
    return out


def relative_position_bucket(relative_position: jax.Array,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jax.Array:
    """HF T5 bidirectional bucketing: half the buckets for each sign,
    exact for small distances, logarithmic beyond."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


class T5RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, bias):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        h = T5RMSNorm(c.layer_norm_epsilon, name="attn_norm")(x)
        q = nn.Dense(inner, use_bias=False, name="q")(h)
        k = nn.Dense(inner, use_bias=False, name="k")(h)
        v = nn.Dense(inner, use_bias=False, name="v")(h)
        b, t, _ = q.shape

        def split(y):
            return y.reshape(b, t, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        # T5 attention is UNSCALED (the 1/sqrt(d) is folded into init)
        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) + bias
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) \
            .astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, t, inner)
        x = x + nn.Dense(c.d_model, use_bias=False, name="o")(o)

        h = T5RMSNorm(c.layer_norm_epsilon, name="ff_norm")(x)
        # v1.1 gated-GELU (HF NewGELUActivation = tanh approximation)
        g = nn.gelu(nn.Dense(c.d_ff, use_bias=False, name="wi_0")(h),
                    approximate=True)
        h = g * nn.Dense(c.d_ff, use_bias=False, name="wi_1")(h)
        return x + nn.Dense(c.d_model, use_bias=False, name="wo")(h)


class T5Encoder(nn.Module):
    """input_ids [B, T] -> last hidden state [B, T, d_model] (the
    reference's `outputs.last_hidden_state`, modules.py:280-284)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        c = self.cfg
        emb = self.param("shared", nn.initializers.normal(1.0),
                         (c.vocab_size, c.d_model))
        x = jnp.take(emb, input_ids, axis=0)
        t = input_ids.shape[-1]
        pos = jnp.arange(t)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            c.relative_attention_num_buckets,
            c.relative_attention_max_distance)
        rel_emb = self.param("relative_attention_bias",
                             nn.initializers.normal(1.0),
                             (c.relative_attention_num_buckets,
                              c.num_heads))
        bias = jnp.take(rel_emb, buckets, axis=0)  # [T, T, H]
        bias = bias.transpose(2, 0, 1)[None]  # [1, H, T, T]
        for i in range(c.num_layers):
            x = T5Block(c, name=f"block_{i}")(x, bias.astype(x.dtype))
        return T5RMSNorm(c.layer_norm_epsilon, name="final_norm")(x)


def import_t5_encoder(state_dict, cfg):
    """Moved to interop (repo convention); kept as an alias."""
    from neurons_tpu.interop.torch_import import import_t5_encoder as _f
    return _f(state_dict, cfg)
