"""AutoencodingEngine — VAE/VQGAN training on TPU.

Re-design of the reference's sgm autoencoder-training harness (reference
generative_models/sgm/models/autoencoder.py:102-435 `AutoencodingEngine`:
encoder/decoder + pluggable regularizer, two optimizers alternating
generator/discriminator steps via optimizer_idx, adaptive GAN weight at
`get_last_layer()`; `AutoencoderLegacyVQ`:523-547 swaps the regularizer
for a VectorQuantizer). NEURONS never trains a VAE, but the reference
ships the whole harness; this module completes it TPU-first.

TPU design: torch-Lightning's `optimizer_idx` alternation becomes two
pure jitted steps (`make_generator_step`, `make_discriminator_step`) over
independent optax states — each differentiates only its own params, so
XLA never builds the other side's backward. The adaptive disc weight
needs d(nll)/d(last-conv) and d(g)/d(last-conv); both come from one
`jax.grad` each over the decoder's `conv_out` kernel leaf, inside the
same jit. Batch axis shards over the `data` mesh axis like every other
train step (grads psum'd by GSPMD).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from neurons_tpu.config import VAEConfig
from neurons_tpu.models.vae import AutoencoderKL, DiagonalGaussian
from neurons_tpu.models.vq import VectorQuantizer
from neurons_tpu.training.perceptual import (LPIPS, NLayerDiscriminator,
                                             discriminator_loss,
                                             generator_loss)


@dataclass
class AutoencoderTrainConfig:
    """The knobs of GeneralLPIPSWithDiscriminator + the engine
    (reference discriminator_loss.py:18-34, autoencoder.py:109-168)."""

    vae: VAEConfig = field(default_factory=VAEConfig)
    regularizer: str = "kl"  # kl | vq | none
    n_codes: int = 8192  # vq only
    codebook_beta: float = 0.25
    kl_weight: float = 1e-6
    perceptual_weight: float = 1.0
    disc_start: int = 50001
    disc_factor: float = 1.0
    disc_weight: float = 0.5
    disc_num_layers: int = 3
    disc_ndf: int = 64
    disc_loss: str = "hinge"
    learn_logvar: bool = False
    lr: float = 4.5e-6


class AutoencodingEngine:
    """Bundles the modules + both optax optimizers. Host-side facade
    (like models/engine.py); the jitted steps are built once via
    `make_generator_step` / `make_discriminator_step`."""

    def __init__(self, cfg: AutoencoderTrainConfig,
                 lpips_params: Optional[Dict] = None):
        self.cfg = cfg
        self.vae = AutoencoderKL(cfg.vae)
        self.disc = NLayerDiscriminator(input_nc=cfg.vae.out_channels,
                                        ndf=cfg.disc_ndf,
                                        n_layers=cfg.disc_num_layers)
        self.lpips = LPIPS() if cfg.perceptual_weight > 0 else None
        self.lpips_params = lpips_params
        self.quant = (VectorQuantizer(cfg.n_codes, cfg.vae.latent_channels,
                                      cfg.codebook_beta)
                      if cfg.regularizer == "vq" else None)
        self.opt_g = optax.adam(cfg.lr, b1=0.5, b2=0.9)
        self.opt_d = optax.adam(cfg.lr, b1=0.5, b2=0.9)

    def init(self, key: jax.Array, image_hw: int = 64):
        """Returns the full train state pytree."""
        kv, kd, kl, kq = jax.random.split(key, 4)
        c = self.cfg
        x = jnp.zeros((1, c.vae.in_channels, image_hw, image_hw))
        vae_params = self.vae.init(kv, x)["params"]
        disc_vars = self.disc.init(kd, x)
        state = {
            "vae": vae_params,
            "disc": disc_vars["params"],
            "disc_stats": disc_vars.get("batch_stats", {}),
            "logvar": jnp.zeros(()),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.quant is not None:
            z = jnp.zeros((1, c.vae.latent_channels, image_hw // 8,
                           image_hw // 8))
            state["quant"] = self.quant.init(kq, z)["params"]
        if self.lpips is not None and self.lpips_params is None:
            # random LPIPS (tests / no pretrained file); real runs pass
            # import_lpips(vgg_lpips ckpt) params instead
            self.lpips_params = self.lpips.init(kl, x, x)["params"]
        gen_params = {"vae": state["vae"]}
        if "quant" in state:
            gen_params["quant"] = state["quant"]
        if c.learn_logvar:
            gen_params["logvar"] = state["logvar"]
        state["opt_g"] = self.opt_g.init(gen_params)
        state["opt_d"] = self.opt_d.init(state["disc"])
        return state

    # ---- functional forward ------------------------------------------------

    def _encode_reg(self, params, x, key):
        """encode + regularize (reference autoencoder.py:196-208)."""
        moments = self.vae.apply({"params": params["vae"]}, x,
                                 method="encode")
        reg_log: Dict[str, jax.Array] = {}
        if self.cfg.regularizer == "kl":
            post = DiagonalGaussian(moments.mean, moments.logvar)
            z = post.sample(key) if key is not None else post.mode()
            lv = jnp.clip(moments.logvar, -30.0, 20.0)
            kl = 0.5 * jnp.sum(moments.mean ** 2 + jnp.exp(lv) - 1.0 - lv,
                               axis=tuple(range(1, moments.mean.ndim)))
            reg_log["kl_loss"] = jnp.sum(kl) / kl.shape[0]
        else:
            z = moments.mean
            if self.quant is not None:
                z, qlog = self.quant.apply({"params": params["quant"]}, z)
                reg_log["loss/vq"] = qlog["loss/vq"]
        return z, reg_log

    def decode(self, params, z):
        return self.vae.apply({"params": params["vae"]}, z, method="decode")

    def reconstruct(self, params, x, key=None):
        z, reg_log = self._encode_reg(params, x, key)
        return self.decode(params, z), reg_log

    # ---- jitted steps ------------------------------------------------------

    def make_generator_step(self) -> Callable:
        c = self.cfg
        reg_w = ({"kl_loss": c.kl_weight} if c.regularizer == "kl"
                 else {"loss/vq": 1.0} if c.regularizer == "vq" else {})

        def lpips_apply(a, b):
            # frozen perceptual net — its params are outside gen_params,
            # so no gradient reaches them
            if self.lpips is None:
                return jnp.zeros((a.shape[0], 1, 1, 1), a.dtype)
            return self.lpips.apply({"params": self.lpips_params}, a, b)

        @jax.jit
        def step(state, x, key):
            # traced disc_start gate: scale the GAN term instead of python
            # branching (reference flips at global_step >= disc_start)
            disc_scale = jnp.where(state["step"] >= c.disc_start, 1.0, 0.0)

            # the reference's generator pass runs the discriminator in
            # TRAIN mode (batch statistics; discriminator_loss.py
            # optimizer_idx=0 under self.training) — eval mode here would
            # normalize with the init running stats and skew d_weight.
            # The batch-stat mutation of this pass is discarded (only
            # the discriminator step owns the running stats).
            def disc_apply(y):
                out, _ = self.disc.apply(
                    {"params": state["disc"],
                     "batch_stats": state["disc_stats"]}, y, train=True,
                    mutable=["batch_stats"])
                return out

            gen_params = {"vae": state["vae"]}
            if "quant" in state:
                gen_params["quant"] = state["quant"]
            if c.learn_logvar:
                gen_params["logvar"] = state["logvar"]

            def loss_fn(gp):
                p = dict(state, **gp)
                recon, reg_log = self.reconstruct(p, x, key)
                logvar = gp.get("logvar", state["logvar"])
                # adaptive weight from the decoder's last conv kernel
                last = gp["vae"]["decoder"]["conv_out"]["kernel"]
                nll_g = jax.grad(self._nll_of_last(p, x, key, logvar,
                                                   lpips_apply))(last)
                g_g = jax.grad(self._g_of_last(p, x, key, disc_apply))(last)
                loss, log = generator_loss(
                    x, recon, lpips_apply=lpips_apply,
                    disc_apply=disc_apply, logvar=logvar,
                    last_layer_grads=(nll_g, g_g),
                    perceptual_weight=c.perceptual_weight,
                    disc_factor=c.disc_factor * disc_scale,
                    disc_weight=c.disc_weight,
                    regularization_log=reg_log,
                    regularization_weights=reg_w)
                return loss, log

            (loss, log), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(gen_params)
            updates, opt_g = self.opt_g.update(grads, state["opt_g"],
                                               gen_params)
            new = optax.apply_updates(gen_params, updates)
            out = dict(state)
            out["vae"] = new["vae"]
            if "quant" in new:
                out["quant"] = new["quant"]
            if c.learn_logvar:
                out["logvar"] = new["logvar"]
            out["opt_g"] = opt_g
            out["step"] = state["step"] + 1
            return out, loss, log

        return step

    def _nll_of_last(self, params, x, key, logvar, lpips_apply):
        """loss(last_kernel) closure for the adaptive weight: nll with the
        decoder's conv_out kernel substituted (functional version of
        torch.autograd.grad(nll, last_layer))."""

        def f(last):
            p = jax.tree_util.tree_map(lambda a: a, params)
            p["vae"] = dict(p["vae"])
            p["vae"]["decoder"] = dict(p["vae"]["decoder"])
            p["vae"]["decoder"]["conv_out"] = dict(
                p["vae"]["decoder"]["conv_out"], kernel=last)
            recon, _ = self.reconstruct(p, x, key)
            rec = jnp.abs(x - recon)
            if self.cfg.perceptual_weight > 0:
                rec = rec + self.cfg.perceptual_weight * lpips_apply(x, recon)
            nll = rec / jnp.exp(logvar) + logvar
            return jnp.sum(nll) / nll.shape[0]

        return f

    def _g_of_last(self, params, x, key, disc_apply):
        def f(last):
            p = jax.tree_util.tree_map(lambda a: a, params)
            p["vae"] = dict(p["vae"])
            p["vae"]["decoder"] = dict(p["vae"]["decoder"])
            p["vae"]["decoder"]["conv_out"] = dict(
                p["vae"]["decoder"]["conv_out"], kernel=last)
            recon, _ = self.reconstruct(p, x, key)
            return -jnp.mean(disc_apply(recon))

        return f

    def make_discriminator_step(self) -> Callable:
        c = self.cfg

        @jax.jit
        def step(state, x, key):
            recon, _ = self.reconstruct(state, x, key)
            recon = jax.lax.stop_gradient(recon)

            def loss_fn(dp):
                # running stats thread SEQUENTIALLY through the real then
                # fake pass (torch mutates them in call order; reading the
                # same input stats twice would drop the real-pass update)
                cur = {"bs": state["disc_stats"]}

                def disc_apply(y):
                    out, mut = self.disc.apply(
                        {"params": dp, "batch_stats": cur["bs"]},
                        y, train=True, mutable=["batch_stats"])
                    cur["bs"] = mut["batch_stats"]
                    return out

                d, log = discriminator_loss(x, recon,
                                            disc_apply=disc_apply,
                                            disc_factor=c.disc_factor,
                                            kind=c.disc_loss)
                return d, (log, cur["bs"])

            (d, (log, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["disc"])
            active = state["step"] >= c.disc_start
            scale = jnp.where(active, 1.0, 0.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, opt_d = self.opt_d.update(grads, state["opt_d"],
                                               state["disc"])
            out = dict(state)
            out["disc"] = optax.apply_updates(state["disc"], updates)
            out["disc_stats"] = stats or state["disc_stats"]
            out["opt_d"] = opt_d
            return out, d, log

        return step
