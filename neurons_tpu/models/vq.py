"""Autoencoder latent regularizers & vector quantizers — TPU-native.

Re-design of the reference's sgm autoencoding regularizer zoo (reference
generative_models/sgm/modules/autoencoding/regularizers/__init__.py:13-31
DiagonalGaussianRegularizer, regularizers/base.py:21-40 Identity +
measure_perplexity, regularizers/quantize.py:64-487 GumbelQuantizer /
VectorQuantizer / EMAVectorQuantizer / VectorQuantizerWithInputProjection).
Training-only in the reference (NEURONS' live stages never quantize), but
they complete the sgm AutoencodingEngine surface.

TPU design notes:
- The nearest-code search is one big [B·H·W, n_e] matmul (MXU-friendly;
  never a scan over codes). Straight-through estimators use
  `jax.lax.stop_gradient` exactly where the reference uses `.detach()`.
- EMA codebook state lives in a flax `ema` variable collection so the
  update is a pure function of (params, state, batch) — apply with
  `mutable=["ema"]` during training; under pmap/pjit the EMA statistics
  must be `psum`-reduced across data shards before the update (pass
  `axis_name` to average over the mesh).
- Indices use argmin over the distance matrix; ties resolve to the lowest
  index (same as torch.argmin).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurons_tpu.models.vae import DiagonalGaussian


def measure_perplexity(indices: jax.Array, num_centroids: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Codebook usage perplexity (reference regularizers/base.py:29-40)."""
    encodings = jax.nn.one_hot(indices.reshape(-1), num_centroids)
    avg_probs = encodings.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    cluster_use = jnp.sum(avg_probs > 0)
    return perplexity, cluster_use


def identity_regularizer(z: jax.Array) -> Tuple[jax.Array, Dict]:
    """reference regularizers/base.py:21-26."""
    return z, {}


def diagonal_gaussian_regularizer(z: jax.Array,
                                  key: Optional[jax.Array] = None,
                                  sample: bool = True
                                  ) -> Tuple[jax.Array, Dict]:
    """KL-to-N(0,1) regularizer over encoder moments (reference
    regularizers/__init__.py:13-31). z: [B, 2·C, H, W] moments (NCHW)."""
    mean, logvar = jnp.split(z, 2, axis=1)
    post = DiagonalGaussian(mean, logvar)
    out = post.sample(key) if (sample and key is not None) else post.mode()
    logvar_c = jnp.clip(logvar, -30.0, 20.0)
    kl = 0.5 * jnp.sum(mean ** 2 + jnp.exp(logvar_c) - 1.0 - logvar_c,
                       axis=tuple(range(1, z.ndim)))
    return out, {"kl_loss": jnp.sum(kl) / kl.shape[0]}


def remap_to_used(inds: jax.Array, used: jax.Array,
                  unknown_index="random",
                  key: Optional[jax.Array] = None,
                  re_embed: Optional[int] = None) -> jax.Array:
    """Map full-codebook indices onto positions in the `used` subset
    (reference regularizers/base.py AbstractQuantizer.remap_to_used,
    quantize.py:26-41). Unknown codes go to a random used slot
    (`unknown_index='random'`, needs `key`) or a fixed index."""
    used = jnp.asarray(used)
    match = inds[..., None] == used[(None,) * inds.ndim]
    new = jnp.argmax(match, axis=-1)
    unknown = ~match.any(axis=-1)
    if unknown_index == "random":
        assert key is not None, "unknown_index='random' needs a PRNG key"
        rnd = jax.random.randint(key, inds.shape, 0,
                                 re_embed or used.shape[0])
        return jnp.where(unknown, rnd, new)
    return jnp.where(unknown, jnp.asarray(unknown_index, new.dtype), new)


def unmap_to_all(inds: jax.Array, used: jax.Array) -> jax.Array:
    """Inverse of remap_to_used (reference quantize.py:43-52); extra
    tokens (index >= len(used)) collapse to code 0."""
    used = jnp.asarray(used)
    inds = jnp.where(inds >= used.shape[0], 0, inds)
    return jnp.take(used, inds, axis=0)


def _nearest_codes(z_flat: jax.Array, codebook: jax.Array) -> jax.Array:
    """argmin_j ||z - e_j||^2 via z^2 + e^2 - 2 z·e (one MXU matmul)."""
    d = (jnp.sum(z_flat ** 2, axis=1, keepdims=True)
         + jnp.sum(codebook ** 2, axis=1)
         - 2.0 * z_flat @ codebook.T)
    return jnp.argmin(d, axis=1)


class VectorQuantizer(nn.Module):
    """VQ-VAE bottleneck (reference quantize.py:172-320): nearest-code
    lookup, commitment loss `beta·||z - sg[e]||² + ||sg[z] - e||²`,
    straight-through gradients. Rank-4 input is NCHW (the reference
    boundary layout); rank ≤3 is quantized on the last axis as-is."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    sane_index_shape: bool = False
    log_perplexity: bool = False
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, Dict]:
        lim = 1.0 / self.n_e
        codebook = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(k, s, minval=-lim, maxval=lim),
            (self.n_e, self.e_dim))
        do_reshape = z.ndim == 4
        if do_reshape:
            z = z.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        zf = z.reshape(-1, self.e_dim)
        idx = _nearest_codes(zf, codebook)
        z_q = jnp.take(codebook, idx, axis=0).reshape(z.shape)

        out: Dict = {}
        if self.log_perplexity:
            perp, usage = measure_perplexity(jax.lax.stop_gradient(idx),
                                             self.n_e)
            out.update({"perplexity": perp, "cluster_usage": usage})
        loss = (self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
                + jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2))
        out[self.loss_key] = loss
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        if do_reshape:
            z_q = z_q.transpose(0, 3, 1, 2)
            if self.sane_index_shape:
                idx = idx.reshape(z_q.shape[0], z_q.shape[2], z_q.shape[3])
        elif self.sane_index_shape:
            idx = idx.reshape(z_q.shape[0], -1)
        out["min_encoding_indices"] = idx
        return z_q, out

    def get_codebook_entry(self, params, indices: jax.Array,
                           shape: Optional[Tuple[int, ...]] = None):
        z_q = jnp.take(jnp.asarray(params["embedding"]), indices, axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape).transpose(0, 3, 1, 2)
        return z_q


class VectorQuantizerWithInputProjection(nn.Module):
    """reference quantize.py:446-487: project into codebook space,
    quantize, project out; flattens any spatial axes to a token axis."""

    input_dim: int
    n_codes: int
    codebook_dim: int
    beta: float = 1.0
    output_dim: int = 0

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, Dict]:
        in_shape = z.shape
        rearr = z.ndim > 3 and self.output_dim
        if z.ndim > 3:  # b c ... -> b (...) c
            z = z.reshape(in_shape[0], in_shape[1], -1).transpose(0, 2, 1)
        z = nn.Dense(self.codebook_dim, name="proj_in")(z)
        z_q, out = VectorQuantizer(self.n_codes, self.codebook_dim,
                                   self.beta, name="quant")(z)
        if self.output_dim:
            z_q = nn.Dense(self.output_dim, name="proj_out")(z_q)
        if rearr:
            if len(in_shape) == 4:
                b, _, h, w = in_shape
                z_q = z_q.transpose(0, 2, 1).reshape(b, -1, h, w)
            elif len(in_shape) == 5:
                b, _, t, h, w = in_shape
                z_q = z_q.transpose(0, 2, 1).reshape(b, -1, t, h, w)
            else:
                raise NotImplementedError(len(in_shape))
        return z_q, out


class EMAVectorQuantizer(nn.Module):
    """reference quantize.py:323-443: codebook maintained by EMA instead
    of gradient descent. State in the `ema` collection — apply with
    `mutable=["ema"]` and `update=True` during training. Under a data
    mesh pass `axis_name` so the batch statistics are summed across
    shards before the EMA (the reference relies on per-rank drift; the
    psum is strictly better)."""

    n_embed: int
    embedding_dim: int
    beta: float
    decay: float = 0.99
    eps: float = 1e-5
    loss_key: str = "loss/vq"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z: jax.Array, update: bool = False
                 ) -> Tuple[jax.Array, Dict]:
        init = nn.initializers.normal(stddev=1.0)
        weight = self.variable("ema", "weight", init, self.make_rng("params")
                               if self.is_initializing() else None,
                               (self.n_embed, self.embedding_dim))
        cluster_size = self.variable("ema", "cluster_size",
                                     lambda *_: jnp.zeros(self.n_embed),
                                     None)
        embed_avg = self.variable("ema", "embed_avg",
                                  lambda *_: jnp.array(weight.value), None)

        b = z.shape[0]
        zt = z.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        zf = zt.reshape(-1, self.embedding_dim)
        idx = _nearest_codes(zf, weight.value)
        z_q = jnp.take(weight.value, idx, axis=0).reshape(zt.shape)
        encodings = jax.nn.one_hot(idx, self.n_embed, dtype=z.dtype)
        avg_probs = encodings.mean(axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        if update:
            enc_sum = encodings.sum(axis=0)
            embed_sum = encodings.T @ jax.lax.stop_gradient(zf)
            if self.axis_name is not None:
                enc_sum = jax.lax.psum(enc_sum, self.axis_name)
                embed_sum = jax.lax.psum(embed_sum, self.axis_name)
            cluster_size.value = (self.decay * cluster_size.value
                                  + (1 - self.decay) * enc_sum)
            embed_avg.value = (self.decay * embed_avg.value
                               + (1 - self.decay) * embed_sum)
            n = cluster_size.value.sum()
            smoothed = ((cluster_size.value + self.eps)
                        / (n + self.n_embed * self.eps) * n)
            weight.value = embed_avg.value / smoothed[:, None]

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - zt) ** 2)
        z_q = zt + jax.lax.stop_gradient(z_q - zt)
        z_q = z_q.transpose(0, 3, 1, 2)
        return z_q, {self.loss_key: loss, "encodings": encodings,
                     "encoding_indices": idx, "perplexity": perplexity}


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax quantizer (reference quantize.py:64-169; Jang et
    al. 2016): 1x1-conv logits over codes, gumbel-softmax sample (hard
    straight-through in eval), KL-to-uniform regularizer. Input NCHW."""

    num_hiddens: int
    embedding_dim: int
    n_embed: int
    straight_through: bool = True
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    loss_key: str = "loss/vq"

    @nn.compact
    def __call__(self, z: jax.Array, key: Optional[jax.Array] = None,
                 temp: Optional[float] = None, training: bool = False
                 ) -> Tuple[jax.Array, Dict]:
        hard = self.straight_through if training else True
        tau = self.temp_init if temp is None else temp
        zt = z.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        logits = nn.Conv(self.n_embed, (1, 1), name="proj")(zt)
        embed = self.param("embed", nn.initializers.normal(stddev=1.0),
                           (self.n_embed, self.embedding_dim))

        if key is not None:
            gumbel = jax.random.gumbel(key, logits.shape, logits.dtype)
        else:
            gumbel = jnp.zeros_like(logits)  # deterministic (eval) path
        y = jax.nn.softmax((logits + gumbel) / tau, axis=-1)
        if hard:
            y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), self.n_embed,
                                    dtype=y.dtype)
            y = y + jax.lax.stop_gradient(y_hard - y)
        z_q = (y @ embed).transpose(0, 3, 1, 2)  # NHWC -> NCHW

        qy = jax.nn.softmax(logits, axis=-1)
        diff = self.kl_weight * jnp.mean(
            jnp.sum(qy * jnp.log(qy * self.n_embed + 1e-10), axis=-1))
        ind = jnp.argmax(y, axis=-1)
        return z_q, {self.loss_key: diff, "indices": ind}
