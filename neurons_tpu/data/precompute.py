"""Precomputed frozen-encoder tables for stage-1/2 training.

The reference runs its frozen encoders inside the train loop every epoch
(CLIP-bigG forward per batch, reference train_neurons.py:400; VAE encode
per batch, :498-499; class-name text embeds, :457). On TPU the right
design is to run each frozen tower ONCE ahead of training and stream the
tables from disk — the 22 GB fp16 CLIP table reads faster than a bigG
forward, frees HBM for the trainable model, and makes the train step a
single compiled graph. This module materializes:

  clip_targets_{split}.npy   [N, F, 256, 1664] fp16   (vision tokens)
  vae_latents_{split}.npy    [N, F, 4, h/8, w/8] fp16 (scaled latents)
  class_text_embeds.npy      [51, 1280] fp32          (CLS_DICT names)

Tables are written incrementally through np.lib.format.open_memmap, so
the 4320-clip table never resides in RAM.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

from neurons_tpu.data.categories import CLS_DICT


def _memmap(path: str, shape, dtype=np.float16):
    return np.lib.format.open_memmap(path, mode="w+", shape=tuple(shape),
                                     dtype=dtype)


def precompute_clip_targets(images: np.ndarray,
                            vision_tokens: Callable[[np.ndarray], np.ndarray],
                            out_path: str, batch_size: int = 16,
                            log_every: int = 50) -> str:
    """images [N, F, 3, H, W] in [0,1]; vision_tokens maps a [B, 3, H, W]
    batch to [B, 256, 1664] CLIP-bigG tokens (jitted caller side)."""
    n, f = images.shape[:2]
    probe = np.asarray(vision_tokens(np.asarray(images[:1, 0],
                                                np.float32)))
    table = _memmap(out_path, (n, f) + probe.shape[1:])
    flat = images.reshape((n * f,) + images.shape[2:])
    for start in range(0, n * f, batch_size):
        stop = min(start + batch_size, n * f)
        batch = np.asarray(flat[start:stop], np.float32)
        if stop - start < batch_size:  # static shapes: pad the tail
            pad = batch_size - (stop - start)
            batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
        out = np.asarray(vision_tokens(batch))[: stop - start]
        table.reshape((n * f,) + table.shape[2:])[start:stop] = \
            out.astype(np.float16)
        if (start // batch_size) % log_every == 0:
            print(f"clip targets {stop}/{n * f}", flush=True)
    table.flush()
    return out_path


def precompute_vae_latents(images: np.ndarray,
                           vae_encode_mode: Callable[[np.ndarray],
                                                     np.ndarray],
                           out_path: str, scale: float = 0.18215,
                           batch_size: int = 16) -> str:
    """images [N, F, 3, H, W] in [0,1]; encodes (2x-1) through the VAE
    posterior mode and scales (reference train_neurons.py:498-499)."""
    n, f = images.shape[:2]
    probe = np.asarray(vae_encode_mode(
        np.asarray(images[:1, 0], np.float32) * 2 - 1))
    table = _memmap(out_path, (n, f) + probe.shape[1:])
    flat = images.reshape((n * f,) + images.shape[2:])
    for start in range(0, n * f, batch_size):
        stop = min(start + batch_size, n * f)
        batch = np.asarray(flat[start:stop], np.float32) * 2 - 1
        if stop - start < batch_size:
            pad = batch_size - (stop - start)
            batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
        z = np.asarray(vae_encode_mode(batch))[: stop - start] * scale
        table.reshape((n * f,) + table.shape[2:])[start:stop] = \
            z.astype(np.float16)
    table.flush()
    return out_path


def precompute_class_text_embeds(
        text_pooled: Callable[[np.ndarray], np.ndarray],
        tokenize: Callable[[Sequence[str]], np.ndarray],
        out_path: str,
        class_names: Optional[Sequence[str]] = None) -> str:
    """Pooled CLIP text embeds of the 51 concept names (reference
    recon_keyframe_neurons_enhance.py:76-128 CLS_DICT + clip_txt_embedder
    at train_neurons.py:457)."""
    names = list(class_names) if class_names is not None else [
        CLS_DICT[i] for i in sorted(CLS_DICT)]
    toks = np.asarray(tokenize(names))
    emb = np.asarray(text_pooled(toks))
    np.save(out_path, emb.astype(np.float32))
    return out_path
