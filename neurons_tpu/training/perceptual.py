"""Perceptual (LPIPS) + PatchGAN discriminator losses — TPU-native.

Re-design of the reference's sgm autoencoder-training losses (reference
generative_models/sgm/modules/autoencoding/lpips/loss/lpips.py:12-147
LPIPS over VGG16 features, lpips/model/model.py:17-88 NLayerDiscriminator,
lpips/vqperceptual.py:5-17 hinge/vanilla d-losses,
losses/discriminator_loss.py:17-306 GeneralLPIPSWithDiscriminator,
losses/lpips.py LatentLPIPS). Training-only in the reference; they
complete the sgm AutoencodingEngine surface for VAE finetuning on TPU.

TPU design notes: all convs NHWC; LPIPS's VGG trunk is frozen — wrap in
`jax.lax.stop_gradient` at the call site or keep its params out of the
optimizer. The adaptive discriminator weight needs two gradients w.r.t.
the decoder's last conv — expressed functionally via `jax.grad` over the
`last_layer` leaf (see `adaptive_weight`). The generator/discriminator
alternation is two pure loss functions (`generator_loss`,
`discriminator_loss`) instead of torch's optimizer_idx branching, so each
jits separately and the two optimizers stay independent optax states.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# VGG16 `features` conv plan: (out_channels, conv indices per LPIPS slice)
_VGG_SLICES = (
    (64, (0, 2)),
    (128, (5, 7)),
    (256, (10, 12, 14)),
    (512, (17, 19, 21)),
    (512, (24, 26, 28)),
)
# channel taps at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3
LPIPS_CHNS = (64, 128, 256, 512, 512)
# ImageNet shift/scale of the LPIPS ScalingLayer (lpips.py:67-78)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """The five LPIPS feature taps of torchvision vgg16.features
    (reference lpips/loss/lpips.py:99-138). Input NHWC in [-1, 1]-ish
    (already scaled by the caller)."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for si, (ch, idxs) in enumerate(_VGG_SLICES):
            if si:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in idxs:
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                    name=f"conv_{ci}")(x))
            taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Learned perceptual metric (reference lpips/loss/lpips.py:12-64):
    unit-normalize each tap over channels, squared diff, per-tap 1x1
    linear head, spatial mean, sum. Inputs NCHW in [-1, 1];
    returns [B, 1, 1, 1]."""

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)

        def prep(t):
            t = t.transpose(0, 2, 3, 1)  # NCHW -> NHWC
            return (t - shift) / scale

        net = VGG16Features(name="net")
        fx, fy = net(prep(x)), net(prep(y))
        val = 0.0
        for k in range(len(LPIPS_CHNS)):
            def unit(t):
                norm = jnp.sqrt(jnp.sum(t ** 2, axis=-1, keepdims=True))
                return t / (norm + 1e-10)
            diff = (unit(fx[k]) - unit(fy[k])) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")(diff)
            val = val + head.mean(axis=(1, 2), keepdims=True)
        return val.transpose(0, 3, 1, 2)  # [B, 1, 1, 1]


class NLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN discriminator (reference lpips/model/model.py:
    17-88): 4x4 stride-2 convs + BatchNorm + LeakyReLU(0.2), 1-channel
    patch logits. Input NCHW; BatchNorm uses batch statistics in
    training (`train=True`, mutable 'batch_stats')."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        h = nn.leaky_relu(
            nn.Conv(self.ndf, (4, 4), strides=2, padding=1,
                    name="conv_0")(x), 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=2, padding=1,
                        use_bias=False, name=f"conv_{n}")(h)
            h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name=f"bn_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=1, padding=1,
                    use_bias=False, name=f"conv_{self.n_layers}")(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name=f"bn_{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (4, 4), strides=1, padding=1, name="conv_out")(h)
        return h.transpose(0, 3, 1, 2)  # NCHW logits


def hinge_d_loss(logits_real, logits_fake):
    """reference lpips/vqperceptual.py:5-10."""
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    """reference lpips/vqperceptual.py:13-17."""
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def nll_from_rec(rec_loss, logvar, weights=None):
    """reference discriminator_loss.py:294-306 — heteroscedastic NLL with
    a (optionally learned) global log-variance."""
    nll = rec_loss / jnp.exp(logvar) + logvar
    weighted = nll if weights is None else weights * nll
    return (jnp.sum(nll) / nll.shape[0],
            jnp.sum(weighted) / weighted.shape[0])


def adaptive_weight(nll_grad_last, g_grad_last, disc_weight: float = 1.0):
    """reference discriminator_loss.py:196-205: balance the GAN term by
    the gradient-norm ratio at the decoder's last layer. Pass the two
    gradients of the scalar losses w.r.t. the same last-layer leaf
    (e.g. via `jax.grad(loss_fn)(last_kernel)`)."""
    d_weight = (jnp.linalg.norm(nll_grad_last)
                / (jnp.linalg.norm(g_grad_last) + 1e-4))
    return jax.lax.stop_gradient(jnp.clip(d_weight, 0.0, 1e4)) * disc_weight


def flatten_video(x):
    """dims=3 handling (discriminator_loss.py:224-228): LPIPS per frame."""
    if x.ndim == 5:  # b c t h w -> (b t) c h w
        b, c, t, h, w = x.shape
        return x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    return x


def generator_loss(inputs, recons, *, lpips_apply, disc_apply, logvar,
                   last_layer_grads: Optional[Tuple] = None,
                   perceptual_weight: float = 1.0, disc_factor: float = 1.0,
                   disc_weight: float = 1.0, disc_active: bool = True,
                   regularization_log: Optional[Dict] = None,
                   regularization_weights: Optional[Dict] = None,
                   weights=None) -> Tuple[jax.Array, Dict]:
    """Generator half of GeneralLPIPSWithDiscriminator.forward
    (reference discriminator_loss.py:207-274, optimizer_idx=0).

    lpips_apply(x, y) -> [B,1,1,1]; disc_apply(x) -> patch logits;
    last_layer_grads = (nll_grad, g_grad) at the decoder's last kernel
    (None -> d_weight 1, the reference's eval behaviour)."""
    inputs, recons = flatten_video(inputs), flatten_video(recons)
    rec = jnp.abs(inputs - recons)
    if perceptual_weight > 0:
        rec = rec + perceptual_weight * lpips_apply(inputs, recons)
    nll, weighted_nll = nll_from_rec(rec, logvar, weights)
    if disc_active:
        g = -jnp.mean(disc_apply(recons))
        d_w = (adaptive_weight(*last_layer_grads, disc_weight)
               if last_layer_grads is not None else jnp.asarray(1.0))
    else:
        g, d_w = jnp.asarray(0.0), jnp.asarray(0.0)
    loss = weighted_nll + d_w * disc_factor * g
    log = {"loss/nll": nll, "loss/rec": rec.mean(), "loss/g": g,
           "scalars/d_weight": d_w, "scalars/logvar": logvar}
    for k, v in (regularization_log or {}).items():
        w = (regularization_weights or {}).get(k)
        if w is not None:
            loss = loss + w * v
        log[k] = jnp.mean(v)
    log["loss/total"] = loss
    return loss, log


def discriminator_loss(inputs, recons, *, disc_apply, disc_factor=1.0,
                       kind: str = "hinge") -> Tuple[jax.Array, Dict]:
    """Discriminator half (reference discriminator_loss.py:275-290,
    optimizer_idx=1). Inputs/recons are stop-gradient'd by construction
    when the caller differentiates w.r.t. discriminator params only."""
    inputs, recons = flatten_video(inputs), flatten_video(recons)
    lr = disc_apply(jax.lax.stop_gradient(inputs))
    lf = disc_apply(jax.lax.stop_gradient(recons))
    fn = hinge_d_loss if kind == "hinge" else vanilla_d_loss
    d = disc_factor * fn(lr, lf)
    return d, {"loss/disc": d, "logits/real": lr.mean(),
               "logits/fake": lf.mean()}


# ---------------------------------------------------------------------------
# torch-weight importers live in interop/torch_import.py (repo
# convention); aliases kept here for the call sites that grew up with
# this module
# ---------------------------------------------------------------------------

def import_lpips(state_dict):
    from neurons_tpu.interop.torch_import import import_lpips as _f
    return _f(state_dict)


def import_nlayer_discriminator(state_dict, n_layers: int = 3):
    from neurons_tpu.interop.torch_import import \
        import_nlayer_discriminator as _f
    return _f(state_dict, n_layers)
