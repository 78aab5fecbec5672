"""Full-width golden parity vs torch replicas (VERDICT round-1 item 1
fallback: no network egress -> no released weights, so validation is
numerics parity at PRODUCTION WIDTHS through the real importer path).

The round-1 suite proves trajectory parity at tiny dims; what it cannot
see is width-dependent drift (production channel counts, head dims,
transformer depths, the depth-10 mid stage, 1664-d context). This tool
instantiates the torch replicas at the production configs (spatial dims
reduced — spatial extent does not change per-channel numerics; channel
dims, head counts and block depths are the reference values), pushes
their random state dicts through the real importers, and compares one
full denoiser evaluation per stage:

  stage3  UNet2DConfig() unclip UNet (320/640/1280 ch, depth (1,2,10),
          ctx 256x1664, adm 1024) at 48x48 latents
  vae     VAEConfig() SD f8 decoder at 24x24 latents
  stage5  UNet3DConfig() AnimateDiff UNet3D + SparseCtrl (full channel
          stack + motion modules) at 4 frames, 16x16 latents

Writes QUALITY_r02.json rows. Run: python tools/fullwidth_parity.py
(CPU-forced; ~10-20 min on one core).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
from neurons_tpu.utils import compile_cache  # noqa: E402
compile_cache.setup("cpu")

import jax.numpy as jnp
import numpy as np
import torch

torch.manual_seed(0)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def stage3_unet():
    from neurons_tpu.config import UNet2DConfig
    from neurons_tpu.interop.torch_import import import_ldm_unet
    from neurons_tpu.models.unet2d import UNetModel
    from test_importers_structural import TLDMUNet

    cfg = UNet2DConfig()
    t0 = time.time()
    tm = TLDMUNet(cfg).eval()
    n_params = sum(p.numel() for p in tm.parameters())
    params, unused = import_ldm_unet(tm.state_dict(), cfg)
    assert not unused, f"unused importer keys: {sorted(unused)[:8]}"
    ju = UNetModel(cfg)

    rs = np.random.RandomState(0)
    hw = 48
    x = rs.randn(1, 4, hw, hw).astype(np.float32)
    ctx = rs.randn(1, 256, 1664).astype(np.float32) * 0.2
    vec = rs.randn(1, cfg.adm_in_channels).astype(np.float32) * 0.2
    t = np.asarray([500.0], np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(t),
                  torch.from_numpy(ctx), torch.from_numpy(vec)).numpy()
    got = np.asarray(ju.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(t), jnp.asarray(ctx),
                              jnp.asarray(vec)))
    return {"component": "stage3_unclip_unet_fullwidth",
            "torch_params": n_params, "latents": f"{hw}x{hw}",
            "rel_err": _rel(got, want), "seconds": round(time.time() - t0)}


def vae_decoder():
    from neurons_tpu.config import VAEConfig
    from neurons_tpu.interop.torch_import import import_ldm_vae
    from neurons_tpu.models.vae import AutoencoderKL
    from test_importers_structural import TLDMVAE

    cfg = VAEConfig()
    t0 = time.time()
    tm = TLDMVAE(cfg).eval()
    params, unused = import_ldm_vae(tm.state_dict(), cfg)
    jv = AutoencoderKL(cfg)
    rs = np.random.RandomState(1)
    z = rs.randn(1, 4, 24, 24).astype(np.float32)
    with torch.no_grad():
        want = tm.decode(torch.from_numpy(z)).numpy()
    got = np.asarray(jv.apply({"params": params}, jnp.asarray(z),
                              method=AutoencoderKL.decode))
    return {"component": "vae_decoder_fullwidth",
            "torch_params": sum(p.numel() for p in tm.parameters()),
            "latents": "24x24", "rel_err": _rel(got, want),
            "seconds": round(time.time() - t0)}


def stage5_unet3d():
    from neurons_tpu.config import UNet3DConfig
    from neurons_tpu.interop.torch_import import (
        filter_motion_module, import_animatediff_unet3d,
        import_motion_modules, import_sparse_controlnet)
    from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
    from neurons_tpu.models.unet3d import UNet3DModel
    from test_video_pipeline_parity import (TorchSparseCtrlNCHW,
                                            TorchUNet3DWithResiduals)

    cfg = UNet3DConfig()
    t0 = time.time()
    tm = TorchUNet3DWithResiduals(cfg).eval()
    tc = TorchSparseCtrlNCHW(cfg).eval()
    # randomize the zero-init output heads so the comparison is not
    # vacuous (verify SKILL.md gotcha)
    with torch.no_grad():
        for name, p in list(tm.named_parameters()) + \
                list(tc.named_parameters()):
            if p.abs().max() == 0:
                p.add_(torch.randn_like(p) * 0.02)
    sd = tm.state_dict()
    spatial = {k: v for k, v in sd.items() if "motion_modules." not in k}
    uparams, u1 = import_animatediff_unet3d(spatial, cfg)
    uparams, u2 = import_motion_modules(filter_motion_module(sd), cfg,
                                        uparams)
    cparams, u3 = import_sparse_controlnet(tc.state_dict(), cfg)
    assert u1 == [] and u2 == [] and u3 == [], (u1[:4], u2[:4], u3[:4])

    f, hw = 4, 16
    ju = UNet3DModel(cfg, n_frames=f)
    jc = SparseControlNetModel(cfg, n_frames=f)
    rs = np.random.RandomState(2)
    x = rs.randn(1, 4, f, hw, hw).astype(np.float32)
    ctx = rs.randn(1, 77, cfg.cross_attention_dim).astype(np.float32) * 0.2
    cond = rs.randn(1, 4, f, hw, hw).astype(np.float32)
    mask = np.zeros((1, 1, f, hw, hw), np.float32)
    mask[:, :, 0] = 1.0
    t = np.asarray([400.0], np.float32)
    with torch.no_grad():
        tdown, tmid = tc(torch.from_numpy(x), torch.from_numpy(t),
                         torch.from_numpy(ctx), torch.from_numpy(cond),
                         torch.from_numpy(mask), 1.0)
        want = tm(torch.from_numpy(x), torch.from_numpy(t),
                  torch.from_numpy(ctx), tdown, tmid).numpy()
    down, mid = jc.apply({"params": cparams}, jnp.asarray(x),
                         jnp.asarray(t), jnp.asarray(ctx),
                         jnp.asarray(cond), jnp.asarray(mask), 1.0)
    got = ju.apply({"params": uparams}, jnp.asarray(x), jnp.asarray(t),
                   jnp.asarray(ctx), down, mid)
    if isinstance(got, tuple):
        got = got[0]
    return {"component": "stage5_unet3d+sparsectrl_fullwidth",
            "torch_params": sum(p.numel() for p in tm.parameters()),
            "shape": f"{f}f x {hw}x{hw}",
            "rel_err": _rel(np.asarray(got), want),
            "seconds": round(time.time() - t0)}


def prior_network():
    """Full-width diffusion prior (dim 1664, depth 6, dim_head 52,
    heads 32, 256+1+256 tokens — reference train_neurons.py:159-173)
    vs the torch dalle2 replica through the real importer."""
    from neurons_tpu.config import PriorConfig
    from neurons_tpu.interop.torch_import import _Tracker, _dalle2_prior_net
    from neurons_tpu.models.prior import PriorNetwork
    from torch_prior_replica import TorchPriorNetwork

    cfg = PriorConfig()
    t0 = time.time()
    tm = TorchPriorNetwork(cfg).eval()
    n_params = sum(p.numel() for p in tm.parameters())
    sd = {f"diffusion_prior.net.{k}": v for k, v in tm.state_dict().items()}
    tr = _Tracker(sd)
    params = _dalle2_prior_net(tr, cfg.depth)
    assert sorted(set(sd) - tr.used) == []

    rs = np.random.RandomState(3)
    img = rs.randn(1, cfg.num_tokens, cfg.dim).astype(np.float32)
    brain = rs.randn(1, cfg.num_tokens, cfg.dim).astype(np.float32)
    t = np.asarray([57.0], np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(img), torch.from_numpy(t),
                  torch.from_numpy(brain)).numpy()
    got = np.asarray(PriorNetwork(cfg).apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(t),
        jnp.asarray(brain)))
    return {"component": "diffusion_prior_fullwidth",
            "torch_params": n_params,
            "tokens": f"{2 * cfg.num_tokens + 1}x{cfg.dim}",
            "rel_err": _rel(got, want),
            "seconds": round(time.time() - t0)}


def mixer_backbone():
    """Full-width BrainModel mixer backbone + clip_proj (h=4096, the
    1.7B-param backbone_linear to 256x1664 tokens — reference
    BrainModel_neurons.py:227-305) vs the torch replica through the
    real importer."""
    from neurons_tpu.config import BrainModelConfig
    from neurons_tpu.interop.torch_import import _Tracker, _mixer_backbone
    from neurons_tpu.models.brain import BrainBackbone
    from test_ensemble_import import TorchMixerBackbone

    cfg = BrainModelConfig()
    t0 = time.time()
    tm = TorchMixerBackbone(cfg.hidden_dim, cfg.seq_len, cfg.n_blocks,
                            cfg.clip_seq_dim * cfg.clip_emb_dim,
                            cfg.clip_emb_dim).eval()
    n_params = sum(p.numel() for p in tm.parameters())
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    params = _mixer_backbone(_Tracker(sd), cfg.n_blocks)
    rs = np.random.RandomState(4)
    x = rs.randn(1, cfg.seq_len, cfg.hidden_dim).astype(np.float32)
    with torch.no_grad():
        v_ref, c_ref = tm(torch.from_numpy(x))
    del tm, sd
    v, c = BrainBackbone(cfg).apply({"params": params}, jnp.asarray(x))
    return {"component": "mixer_backbone_fullwidth",
            "torch_params": n_params,
            "rel_err": max(_rel(np.asarray(v), v_ref.numpy()),
                           _rel(np.asarray(c), c_ref.numpy())),
            "seconds": round(time.time() - t0)}


def gpt2_captioner():
    """Full-width GPT-2 captioner LM (124M, HF key layout) vs
    transformers GPT2LMHeadModel built offline from config — covers the
    stage-3 caption head at production width incl. the weight-tied
    vocab projection."""
    from neurons_tpu.interop.torch_import import import_gpt2
    from neurons_tpu.models.gpt2 import GPT2Config, _InnerLM
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    cfg = GPT2Config()
    t0 = time.time()
    hf = GPT2LMHeadModel(HFConfig(
        vocab_size=cfg.vocab_size, n_positions=cfg.n_positions,
        n_embd=cfg.n_embd, n_layer=cfg.n_layer, n_head=cfg.n_head)).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    params, unused = import_gpt2(hf.state_dict(), cfg.n_layer)
    assert not unused, unused[:8]
    rs = np.random.RandomState(5)
    toks = rs.randint(0, cfg.vocab_size, (1, 33))
    with torch.no_grad():
        want = hf(torch.from_numpy(toks)).logits.numpy()
    del hf
    # drive the inner LM on token embeddings, the test_torch_parity
    # pattern (TextDecoder prepends a CLIP prefix token HF has no
    # equivalent for)
    wte = jnp.asarray(params["wte"])
    emb = jnp.take(wte, jnp.asarray(toks), axis=0)
    got = np.asarray(_InnerLM(cfg).apply(
        {"params": params["lm"]}, emb, wte))
    return {"component": "gpt2_captioner_fullwidth",
            "torch_params": n_params,
            "rel_err": _rel(got, want),
            "seconds": round(time.time() - t0)}


def clip_text_sd15():
    """Full-width SD-1.5 CLIP text encoder (openai ViT-L/14 text half,
    QuickGELU — the stage-5 prompt embedder) vs an offline-config HF
    CLIPTextModel through the real importer."""
    from transformers import CLIPTextConfig as HFTextConfig, CLIPTextModel
    from neurons_tpu.interop.torch_import import import_hf_clip_text
    from neurons_tpu.models.clip import CLIPTextConfig, CLIPTextTower
    from neurons_tpu.utils.checkpoint import restore_into

    cfg = CLIPTextConfig.sd15()
    t0 = time.time()
    hf = CLIPTextModel(HFTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.width,
        intermediate_size=4 * cfg.width, num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        max_position_embeddings=cfg.context_length,
        hidden_act="quick_gelu")).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    params, unused = import_hf_clip_text(hf.state_dict(), layers=cfg.layers)
    assert not unused, unused[:8]
    tower = CLIPTextTower(cfg)
    init_p = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    params = restore_into(init_p, params)
    rs = np.random.RandomState(6)
    ids = rs.randint(1, cfg.vocab_size - 1, (2, cfg.context_length))
    ids[:, -1] = cfg.vocab_size - 1
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    del hf
    last, _ = tower.apply({"params": params}, jnp.asarray(ids))
    return {"component": "clip_text_sd15_fullwidth",
            "torch_params": n_params,
            "rel_err": _rel(np.asarray(last), want),
            "seconds": round(time.time() - t0)}


def clip_vision_l14():
    """Full-width openai CLIP ViT-L/14 vision tower (the CLIP-pcc metric
    tower, reference eval_metrics.py:294-315) vs an offline-config HF
    CLIPVisionModelWithProjection through the real importer."""
    from transformers import CLIPVisionConfig as HFVC
    from transformers import CLIPVisionModelWithProjection
    from neurons_tpu.interop.torch_import import import_hf_clip_vision
    from neurons_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower

    cfg = CLIPVisionConfig.vit_l14()
    t0 = time.time()
    hf = CLIPVisionModelWithProjection(HFVC(
        hidden_size=cfg.width, intermediate_size=4 * cfg.width,
        num_hidden_layers=cfg.layers, num_attention_heads=cfg.heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        projection_dim=cfg.output_dim, hidden_act="quick_gelu")).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    params, unused = import_hf_clip_vision(hf.state_dict(),
                                           layers=cfg.layers)
    assert not unused, unused[:8]
    rs = np.random.RandomState(7)
    x = rs.randn(1, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    del hf
    pooled, _ = CLIPVisionTower(cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x))
    return {"component": "clip_vision_l14_fullwidth",
            "torch_params": n_params,
            "rel_err": _rel(np.asarray(pooled), want),
            "seconds": round(time.time() - t0)}


def decoupler_fullwidth():
    """Full-width TextDrivenDecoder + DecoderVideo (the stage-2/3
    decoupler seg + blurry-recon head: 1664-d vision tokens, 1280-d text,
    (32,64,128) decoder channels, 6-frame temporal blend — reference
    BrainModel_neurons.py:28-112 + video_decoder.py) vs the key-exact
    torch replica through the real importer mapping."""
    import test_decoder_video_parity as tdv
    from neurons_tpu.interop.torch_import import (_Tracker, _decoder_video,
                                                  conv, linear, norm)
    from neurons_tpu.models.decoder_video import TextDrivenDecoder

    # production widths (the test module's globals are tiny dims)
    tdv.CV, tdv.CT, tdv.BO, tdv.G = 1664, 1280, (32, 64, 128), 32
    t0 = time.time()
    torch.manual_seed(2)
    tm = tdv.TTextDrivenDecoder().eval()
    n_params = sum(p.numel() for p in tm.parameters())
    with torch.no_grad():  # exercise the temporal path
        tm.video_decoder.mid_block.weights[0].fill_(0.7)
        for blk in tm.video_decoder.up_blocks:
            for w in blk.weights:
                w.fill_(0.6)
    sd = {f"text_seg_dec.{k}": v for k, v in tm.state_dict().items()}
    tr = _Tracker(sd)
    params = {
        "q": linear(tr, "text_seg_dec.q"),
        "k": linear(tr, "text_seg_dec.k"),
        "v": linear(tr, "text_seg_dec.v"),
        "out": linear(tr, "text_seg_dec.out"),
        "norm": norm(tr, "text_seg_dec.norm"),
        "maps_0": conv(tr, "text_seg_dec.maps_projector.0"),
        "maps_gn_0": norm(tr, "text_seg_dec.maps_projector.1"),
        "maps_1": conv(tr, "text_seg_dec.maps_projector.3"),
        "maps_gn_1": norm(tr, "text_seg_dec.maps_projector.4"),
        "maps_2": conv(tr, "text_seg_dec.maps_projector.6"),
        "video_decoder": _decoder_video(
            tr, "text_seg_dec.video_decoder", 3, 1),
        "seg_head": conv(tr, "text_seg_dec.seg_head"),
        "recon_head": conv(tr, "text_seg_dec.recon_head"),
    }
    assert tr.unused() == [], tr.unused()

    n_frames = 6
    jm = TextDrivenDecoder()  # production defaults
    rs = np.random.RandomState(8)
    vision = rs.randn(n_frames, 256, 1664).astype(np.float32) * 0.2
    text = rs.randn(n_frames, 1280).astype(np.float32) * 0.2
    with torch.no_grad():
        ref_seg = tm(torch.tensor(vision), torch.tensor(text), n_frames,
                     True).numpy()
        ref_rec = tm(torch.tensor(vision), torch.tensor(text), n_frames,
                     False).numpy()
    del tm, sd
    got_seg = jm.apply({"params": params}, jnp.asarray(vision),
                       jnp.asarray(text), time=n_frames, is_seg=True)
    got_rec = jm.apply({"params": params}, jnp.asarray(vision),
                       jnp.asarray(text), time=n_frames, is_seg=False)
    return {"component": "decoupler_heads_fullwidth",
            "torch_params": n_params, "frames": n_frames,
            "rel_err": max(_rel(np.asarray(got_seg), ref_seg),
                           _rel(np.asarray(got_rec), ref_rec)),
            "seconds": round(time.time() - t0)}


def blip2_fullwidth():
    """Full-width BLIP-2 captioner (EVA ViT-g 39-layer vision tower,
    12-layer Q-Former, OPT-2.7B — the stage-4 model, reference
    caption_keyframe.py:23-48) teacher-forced logits vs an
    offline-config HF Blip2ForConditionalGeneration."""
    from transformers import (Blip2Config as HFBlip2Config,
                              Blip2ForConditionalGeneration,
                              Blip2QFormerConfig as HFQFormer,
                              Blip2VisionConfig as HFVision, OPTConfig as
                              HFOPT)
    from neurons_tpu.interop.torch_import import import_blip2
    from neurons_tpu.models.blip2 import Blip2Captioner, Blip2Config

    cfg = Blip2Config()  # production defaults
    t0 = time.time()
    hf_cfg = HFBlip2Config.from_vision_qformer_text_configs(
        HFVision(hidden_size=cfg.vision.hidden_size,
                 num_hidden_layers=cfg.vision.layers,
                 num_attention_heads=cfg.vision.heads,
                 intermediate_size=cfg.vision.intermediate_size,
                 patch_size=cfg.vision.patch_size,
                 image_size=cfg.vision.image_size),
        HFQFormer(hidden_size=cfg.qformer.hidden_size,
                  num_hidden_layers=cfg.qformer.layers,
                  num_attention_heads=cfg.qformer.heads,
                  intermediate_size=cfg.qformer.intermediate_size,
                  cross_attention_frequency=(
                      cfg.qformer.cross_attention_frequency),
                  encoder_hidden_size=cfg.vision.hidden_size),
        HFOPT(hidden_size=cfg.opt.hidden_size,
              num_hidden_layers=cfg.opt.layers,
              num_attention_heads=cfg.opt.heads, ffn_dim=cfg.opt.ffn_dim,
              vocab_size=cfg.opt.vocab_size,
              max_position_embeddings=cfg.opt.max_position_embeddings,
              do_layer_norm_before=True,
              word_embed_proj_dim=cfg.opt.hidden_size),
        num_query_tokens=cfg.qformer.num_query_tokens)
    torch.manual_seed(3)
    hf = Blip2ForConditionalGeneration(hf_cfg).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    params, unused = import_blip2(hf.state_dict(), cfg)
    assert unused == [], unused[:8]

    rs = np.random.RandomState(9)
    pix = rs.randn(1, 3, cfg.vision.image_size,
                   cfg.vision.image_size).astype(np.float32)
    ids = rs.randint(0, cfg.opt.vocab_size, (1, 7)).astype(np.int64)
    with torch.no_grad():
        img = hf.vision_model(torch.tensor(pix)).last_hidden_state
        q = hf.query_tokens.expand(1, -1, -1)
        qo = hf.qformer(query_embeds=q,
                        encoder_hidden_states=img).last_hidden_state
        proj = hf.language_projection(qo)
        tok = hf.language_model.model.decoder.embed_tokens(
            torch.tensor(ids))
        emb = torch.cat([proj, tok], dim=1)
        ref = hf.language_model(
            inputs_embeds=emb,
            attention_mask=torch.ones(emb.shape[:2], dtype=torch.long)
        ).logits.numpy()
    del hf
    got = np.asarray(Blip2Captioner(cfg).apply(
        {"params": params}, jnp.asarray(pix), jnp.asarray(ids)))
    return {"component": "blip2_captioner_fullwidth",
            "torch_params": n_params,
            "rel_err": _rel(got, ref), "seconds": round(time.time() - t0)}


def vit_classifier_fullwidth():
    """Stage-6 frame classifier (reference eval_metrics.py:72-105,
    google/vit-base-patch16-224): ViT-base at the production config
    (768 wide, 12 layers, 1000 classes, 224x224 input)."""
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTForImageClassification

    from neurons_tpu.interop.torch_import import import_hf_vit_classifier
    from neurons_tpu.models.vit import ViTClassifier, ViTConfig

    t0 = time.time()
    torch.manual_seed(0)
    hf = ViTForImageClassification(HFViTConfig(num_labels=1000)).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    params, unused = import_hf_vit_classifier(hf.state_dict(), layers=12)
    assert unused == [], unused
    x = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(x)).logits.numpy()
    del hf
    got = np.asarray(ViTClassifier(ViTConfig.vit_base_224()).apply(
        {"params": params}, jnp.asarray(x)))
    return {"component": "vit_classifier_fullwidth",
            "torch_params": n_params,
            "rel_err": _rel(got, ref), "seconds": round(time.time() - t0)}


def videomae_classifier_fullwidth():
    """Stage-6 video classifier (reference eval_metrics.py:107-142,
    MCG-NJU/videomae-base-finetuned-kinetics): VideoMAE-base at the
    production config (768 wide, 12 layers, 400 Kinetics classes,
    16 frames x 224x224, tubelet 2, mean pooling)."""
    from transformers import VideoMAEConfig, VideoMAEForVideoClassification

    from neurons_tpu.interop.torch_import import import_videomae_classifier
    from neurons_tpu.models.vit import ViTClassifier, ViTConfig

    t0 = time.time()
    torch.manual_seed(0)
    hf = VideoMAEForVideoClassification(VideoMAEConfig(
        num_frames=16, num_labels=400, use_mean_pooling=True)).eval()
    n_params = sum(p.numel() for p in hf.parameters())
    n_tokens = (16 // 2) * (224 // 16) * (224 // 16)
    params, unused = import_videomae_classifier(hf.state_dict(), layers=12,
                                                num_tokens=n_tokens)
    assert unused == [], unused
    x = np.random.RandomState(1).randn(1, 16, 3, 224, 224).astype(
        np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(x)).logits.numpy()
    del hf
    got = np.asarray(ViTClassifier(
        ViTConfig.videomae_kinetics(16)).apply(
            {"params": params}, jnp.asarray(x)))
    return {"component": "videomae_classifier_fullwidth",
            "torch_params": n_params,
            "rel_err": _rel(got, ref), "seconds": round(time.time() - t0)}


ALL_ROWS = (vae_decoder, prior_network, mixer_backbone, gpt2_captioner,
            clip_text_sd15, clip_vision_l14, decoupler_fullwidth,
            blip2_fullwidth, vit_classifier_fullwidth,
            videomae_classifier_fullwidth, stage5_unet3d, stage3_unet)


def main():
    names = set(sys.argv[1:])
    fns = [f for f in ALL_ROWS if not names or f.__name__ in names]
    rows = []
    for fn in fns:
        r = fn()
        print(json.dumps(r), flush=True)
        rows.append(r)
    out_path = os.path.join(_REPO, "QUALITY_r02.json")
    doc = {
        "note": ("No network egress in this environment: the released "
                 "weight set (unclip6 ckpt, RealisticVision, v3 motion "
                 "module/adapter/SparseCtrl, MindEye2 last.pth) and the "
                 "reference EXP dump are unfetchable, so the BASELINE "
                 "SSIM/2-way-vs-reference bar cannot be scored this "
                 "round. Fallback per VERDICT item 1: numerics parity at "
                 "production widths through the real importers (below), "
                 "on top of the suite's tiny-dim trajectory parity "
                 "(tests/test_sampling_parity.py, "
                 "tests/test_video_pipeline_parity.py) and golden "
                 "importer tests."),
        "fullwidth_parity": rows,
        "pass_bar": "rel_err < 2e-4 per component (f32 forward)",
    }
    if os.path.exists(out_path):  # merge with prior rows by component
        with open(out_path) as fh:
            doc = {**json.load(fh), **{"pass_bar": doc["pass_bar"]}}
        have = {r["component"]: r for r in doc.get("fullwidth_parity", [])}
        for r in rows:
            have[r["component"]] = r
        doc["fullwidth_parity"] = list(have.values())
    doc["all_pass"] = all(r["rel_err"] < 2e-4
                          for r in doc["fullwidth_parity"])
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"-> {out_path}")
    if not doc["all_pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
