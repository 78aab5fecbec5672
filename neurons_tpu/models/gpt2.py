"""GPT-2 language model + CLIP-prefix caption decoder.

Re-implements the reference's scene-caption head (reference
model_variants/BrainModel_neurons.py:147-186 `TextDecoder`, which wraps HF
GPT2LMHeadModel): a projected CLIP-text vector (1280 -> 768) is prepended to
the token embeddings as a one-token prefix and a GPT-2 LM predicts the
caption. Greedy decoding (reference recon_keyframe_neurons.py:78-114
`Decoding`, early stop at CLIP EOT 49407) is a fixed-length `lax.scan` with
stop masking — TPU-friendly static shapes instead of a dynamic Python loop.

The GPT-2 block structure matches HF's (ln_1 -> attn -> residual, ln_2 ->
mlp(gelu_new) -> residual, learned wpe, weight-tied lm_head) so HF "gpt2"
checkpoints import 1:1 (interop/torch_import.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.ops.attention import xla_attention


class GPT2Config(NamedTuple):
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5


def tiny_gpt2_config() -> GPT2Config:
    return GPT2Config(vocab_size=128, n_positions=64, n_embd=32, n_layer=2,
                      n_head=4)


def gelu_new(x):
    """HF 'gelu_new' (tanh approximation), GPT-2's activation."""
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * jnp.power(x, 3.0))))


class GPT2Block(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        b, t, d = x.shape
        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // c.n_head

        def split(y):
            return y.reshape(b, t, c.n_head, hd).transpose(0, 2, 1, 3)

        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        attn = xla_attention(split(q), split(k), split(v), mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, name="c_proj")(attn)

        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_2")(x)
        h = nn.Dense(4 * d, name="mlp_fc")(h)
        h = gelu_new(h)
        x = x + nn.Dense(d, name="mlp_proj")(h)
        return x


class TextDecoder(nn.Module):
    """CLIP-prefix captioner (reference BrainModel_neurons.py:162-186):
    clip_project (Dense prefix_size -> n_embd), prefix-concat, GPT-2 LM."""

    cfg: GPT2Config
    prefix_size: int = 1280

    def setup(self):
        # wte lives here so embed/decode can share it with the LM head
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (self.cfg.vocab_size, self.cfg.n_embd))
        self.clip_project = nn.Dense(self.cfg.n_embd, name="clip_project")
        self.lm = _InnerLM(self.cfg)

    def __call__(self, clip_features: jax.Array, tokens: jax.Array
                 ) -> jax.Array:
        """clip_features [B, prefix_size], tokens [B, T] ->
        logits [B, 1 + T, vocab] (prefix position included, as HF returns;
        the trainer drops the last position, reference
        train_neurons.py:486-488)."""
        emb_text = jnp.take(jnp.asarray(self.wte), tokens, axis=0)
        prefix = self.clip_project(clip_features)[:, None]
        x = jnp.concatenate([prefix, emb_text], axis=1)
        return self.lm(x, self.wte)

    def greedy_decode(self, clip_features: jax.Array, max_len: int = 60,
                      eot_token: int = 49407) -> jax.Array:
        """Greedy decode (reference recon_keyframe_neurons.py:78-114):
        start from the CLIP prefix, argmax next token, stop at EOT.
        Fixed-length scan; positions after EOT are filled with EOT."""
        b = clip_features.shape[0]
        prefix = self.clip_project(clip_features)[:, None]

        def step(carry, i):
            tokens, done = carry
            emb = jnp.take(jnp.asarray(self.wte), tokens, axis=0)
            x = jnp.concatenate([prefix, emb], axis=1)
            # next token predicted at position i (prefix occupies pos 0);
            # project only that row through the 50k-vocab head — the full
            # [B, 1+max_len, V] logits are 61x wasted FLOPs per step
            logits = self.lm(x, self.wte, head_position=i)  # [B, 1, V]
            nxt = jnp.argmax(logits[:, 0], axis=-1)
            nxt = jnp.where(done, eot_token, nxt)
            tokens = tokens.at[:, i].set(nxt)
            done = done | (nxt == eot_token)
            return (tokens, done), None

        tokens0 = jnp.zeros((b, max_len), jnp.int32)
        done0 = jnp.zeros((b,), bool)
        (tokens, _), _ = jax.lax.scan(step, (tokens0, done0),
                                      jnp.arange(max_len))
        return tokens


class _InnerLM(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, inputs_embeds: jax.Array, wte: jax.Array,
                 head_position: Optional[jax.Array] = None) -> jax.Array:
        """head_position: when given (greedy decode), only that sequence
        position is projected through the vocab head -> [B, 1, V]."""
        c = self.cfg
        b, t, d = inputs_embeds.shape
        wpe = self.param("wpe", nn.initializers.normal(0.01),
                         (c.n_positions, c.n_embd))
        x = inputs_embeds + wpe[:t][None]
        for i in range(c.n_layer):
            x = GPT2Block(c, name=f"h_{i}")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_f")(x)
        if head_position is not None:
            x = jax.lax.dynamic_slice_in_dim(x, head_position, 1, axis=1)
        return x @ wte.T
