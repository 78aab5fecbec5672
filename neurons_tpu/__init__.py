"""neurons_tpu — TPU-native (JAX/XLA/Pallas/pjit) fMRI-to-video reconstruction framework.

A from-scratch rebuild of the capabilities of xmed-lab/NEURONS (ICCV 2025) as an
idiomatic JAX system: voxel->CLIP brain decoding, visual-cortex-inspired decoupler
heads, diffusion-prior sampling, SD-unCLIP keyframe reconstruction, and an
AnimateDiff-style temporal video diffusion stack — all compiled under `jit` and
sharded over a `jax.sharding.Mesh` (GSPMD) rather than DDP/NCCL.

Layout (mirrors SURVEY.md section 2's component inventory):
  neurons_tpu.models      — flax modules (brain encoder, prior, decoupler, UNets, VAE, CLIP)
  neurons_tpu.ops         — Pallas TPU kernels + XLA fallbacks (flash attention, fused norms)
  neurons_tpu.diffusion   — noise schedules, samplers (lax.scan), guidance
  neurons_tpu.parallel    — mesh construction, sharding rules, collectives
  neurons_tpu.training    — losses, curriculum, stage-1/2 train loops
  neurons_tpu.pipelines   — stage-3/4/5 inference pipelines
  neurons_tpu.evaluation  — stage-6 metric suite (SSIM/PSNR/n-way/CLIP-pcc)
  neurons_tpu.data        — CC2017 dataset + sharded host loaders + task construction
  neurons_tpu.interop     — PyTorch/open_clip/diffusers checkpoint importers
  neurons_tpu.utils       — PRNG threading, checkpointing (Orbax), logging
"""

__version__ = "0.1.0"
