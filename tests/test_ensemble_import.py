"""Reference NEURONS ensemble importer: a key-exact synthetic checkpoint
(layout hand-derived from reference model_variants/BrainModel_neurons.py +
video_decoder.py + dalle2-pytorch) must import with zero unused keys,
match the flax init tree exactly, and run finite; the mixer backbone is
additionally numerics-checked against a live torch replica."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from neurons_tpu.config import (BrainModelConfig, DecouplerConfig,
                                PriorConfig)
from neurons_tpu.interop.torch_import import import_neurons_ensemble
from neurons_tpu.models.gpt2 import tiny_gpt2_config
from neurons_tpu.models.neurons import NeuronsDecoupler


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(np.shape(v))
    return out


class TorchMixerBackbone(tnn.Module):
    """Key-exact replica of reference BrainModel (:227-305)."""

    def __init__(self, h, seq_len, n_blocks, out_dim, clip_size):
        super().__init__()

        def mlp(d):
            return tnn.Sequential(tnn.Linear(d, d), tnn.GELU(),
                                  tnn.Dropout(0.0), tnn.Linear(d, d))

        self.mixer_blocks1 = tnn.ModuleList(
            [tnn.Sequential(tnn.LayerNorm(h), mlp(h))
             for _ in range(n_blocks)])
        self.mixer_blocks2 = tnn.ModuleList(
            [tnn.Sequential(tnn.LayerNorm(seq_len), mlp(seq_len))
             for _ in range(n_blocks)])
        self.backbone_linear = tnn.Linear(h * seq_len, out_dim)
        self.clip_proj = tnn.Sequential(
            tnn.LayerNorm(clip_size), tnn.GELU(),
            tnn.Linear(clip_size, clip_size), tnn.LayerNorm(clip_size),
            tnn.GELU(), tnn.Linear(clip_size, clip_size),
            tnn.LayerNorm(clip_size), tnn.GELU(),
            tnn.Linear(clip_size, clip_size))

    def forward(self, x):
        r1, r2 = x, x.permute(0, 2, 1)
        for b1, b2 in zip(self.mixer_blocks1, self.mixer_blocks2):
            x = b1(x) + r1
            r1 = x
            x = x.permute(0, 2, 1)
            x = b2(x) + r2
            r2 = x
            x = x.permute(0, 2, 1)
        x = x.reshape(x.size(0), -1)
        v = self.backbone_linear(x).reshape(len(x), -1,
                                            self.clip_proj[0].weight.shape[0])
        return v, self.clip_proj(v)


BCFG = BrainModelConfig(hidden_dim=16, n_blocks=2, seq_len=1,
                        clip_seq_dim=4, clip_emb_dim=8, clip_txt_emb_dim=6,
                        subjects=(1, 2))
PCFG = PriorConfig(dim=8, depth=2, dim_head=4, heads=2, num_tokens=4,
                   timesteps=5)
DCFG = DecouplerConfig(n_frames=2, num_classes=7, clip_emb_dim=8,
                       clip_txt_emb_dim=6,
                       decoder_block_out_channels=(4, 8, 8))
GCFG = tiny_gpt2_config()


def _rand(shape):
    return torch.randn(*shape) * 0.05


def _ln(sd, key, d):
    sd[f"{key}.weight"] = torch.ones(d)
    sd[f"{key}.bias"] = torch.zeros(d)


def _lin(sd, key, din, dout, bias=True):
    sd[f"{key}.weight"] = _rand((dout, din))
    if bias:
        sd[f"{key}.bias"] = _rand((dout,))


def _conv(sd, key, cin, cout, k, bias=True):
    sd[f"{key}.weight"] = _rand((cout, cin, k, k))
    if bias:
        sd[f"{key}.bias"] = _rand((cout,))


def _build_reference_sd(BCFG=BCFG, PCFG=PCFG, DCFG=DCFG, GCFG=GCFG):
    """Synthesize the reference Neurons container state dict at the tiny
    config, key layout from BrainModel_neurons.py / video_decoder.py /
    dalle2-pytorch."""
    sd = {}
    tm = TorchMixerBackbone(BCFG.hidden_dim, BCFG.seq_len, BCFG.n_blocks,
                            BCFG.clip_seq_dim * BCFG.clip_emb_dim,
                            BCFG.clip_emb_dim)
    for k, v in tm.state_dict().items():
        sd[f"backbone.{k}"] = v
    for i, nv in enumerate(BCFG.voxel_counts):
        _lin(sd, f"ridge.linears.{i}", nv, BCFG.hidden_dim)
    sd["clipproj.proj"] = _rand((BCFG.clip_emb_dim, BCFG.clip_txt_emb_dim))

    # dalle2 prior network
    d, dh, nt = PCFG.dim, PCFG.dim_head, PCFG.num_tokens
    pre = "diffusion_prior.net."
    sd[pre + "null_brain_embeds"] = _rand((nt, d))
    sd[pre + "null_image_embed"] = _rand((nt, d))
    sd[pre + "learned_query"] = _rand((nt, d))
    _lin(sd, pre + "to_time_embeds.0.1.net.0.0", d, 2 * d)
    _lin(sd, pre + "to_time_embeds.0.1.net.1.0", 2 * d, 2 * d)
    _lin(sd, pre + "to_time_embeds.0.1.net.2", 2 * d, d)
    ct = pre + "causal_transformer."
    sd[ct + "rel_pos_bias.relative_attention_bias.weight"] = _rand(
        (32, PCFG.heads))
    for i in range(PCFG.depth):
        a = ct + f"layers.{i}.0"
        sd[f"{a}.norm.g"] = torch.ones(d)
        sd[f"{a}.null_kv"] = _rand((2, dh))
        _lin(sd, f"{a}.to_q", d, dh * PCFG.heads, bias=False)
        _lin(sd, f"{a}.to_kv", d, dh * 2, bias=False)
        _lin(sd, f"{a}.to_out.0", dh * PCFG.heads, d, bias=False)
        sd[f"{a}.to_out.1.g"] = torch.ones(d)
        f = ct + f"layers.{i}.1"
        sd[f"{f}.0.g"] = torch.ones(d)
        _lin(sd, f"{f}.1", d, 2 * d * PCFG.ff_mult, bias=False)
        _lin(sd, f"{f}.5", d * PCFG.ff_mult, d, bias=False)
    sd[ct + "norm.g"] = torch.ones(d)
    _lin(sd, ct + "project_out", d, d, bias=False)

    _lin(sd, "motion_proj.motion_proj", BCFG.clip_emb_dim,
         BCFG.clip_emb_dim * DCFG.n_frames)
    _lin(sd, "classifier.vision_proj_channel", BCFG.clip_emb_dim,
         BCFG.clip_txt_emb_dim)
    _lin(sd, "classifier.classifier", BCFG.clip_txt_emb_dim,
         DCFG.num_classes)

    # text_seg_dec
    ct_txt = BCFG.clip_txt_emb_dim
    for n in ("q",):
        _lin(sd, f"text_seg_dec.{n}", BCFG.clip_emb_dim, ct_txt, bias=False)
    for n in ("k", "v", "out"):
        _lin(sd, f"text_seg_dec.{n}", ct_txt, ct_txt, bias=False)
    _ln(sd, "text_seg_dec.norm", 64)
    # maps_projector 1x1 convs ct->512->128->64
    sd["text_seg_dec.maps_projector.0.weight"] = _rand((512, ct_txt, 1, 1))
    _ln(sd, "text_seg_dec.maps_projector.1", 512)
    sd["text_seg_dec.maps_projector.3.weight"] = _rand((128, 512, 1, 1))
    _ln(sd, "text_seg_dec.maps_projector.4", 128)
    sd["text_seg_dec.maps_projector.6.weight"] = _rand((64, 128, 1, 1))
    sd["text_seg_dec.maps_projector.6.bias"] = _rand((64,))

    # DecoderVideo: conv_in -> mid -> 3 up blocks (reversed channels)
    bo = DCFG.decoder_block_out_channels
    vd = "text_seg_dec.video_decoder"
    _conv(sd, f"{vd}.conv_in", 64, bo[-1], 3)

    def resnet(key, cin, cout, g):
        _ln(sd, f"{key}.norm1", cin)
        _conv(sd, f"{key}.conv1", cin, cout, 3)
        _ln(sd, f"{key}.norm2", cout)
        _conv(sd, f"{key}.conv2", cout, cout, 3)
        if cin != cout:
            _conv(sd, f"{key}.conv_shortcut", cin, cout, 1)

    def attn(key, c):
        _ln(sd, f"{key}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            _lin(sd, f"{key}.{n}", c, c)
        _lin(sd, f"{key}.to_out.0", c, c)

    ch = bo[-1]
    resnet(f"{vd}.mid_block.resnets.0", ch, ch, 4)
    attn(f"{vd}.mid_block.attentions.0", ch)
    attn(f"{vd}.mid_block.temp_attentions.0", ch)
    sd[f"{vd}.mid_block.weights.0"] = torch.ones(1)
    resnet(f"{vd}.mid_block.resnets.1", ch, ch, 4)
    rev = list(reversed(bo))
    for i, out_c in enumerate(rev):
        for j in range(DCFG.decoder_layers_per_block + 1
                       if hasattr(DCFG, "decoder_layers_per_block") else 2):
            resnet(f"{vd}.up_blocks.{i}.resnets.{j}", ch, out_c, 4)
            ch = out_c
            attn(f"{vd}.up_blocks.{i}.attentions.{j}", ch)
            attn(f"{vd}.up_blocks.{i}.temp_attentions.{j}", ch)
            sd[f"{vd}.up_blocks.{i}.weights.{j}"] = torch.ones(1)
        if i != len(rev) - 1:
            _conv(sd, f"{vd}.up_blocks.{i}.upsamplers.0.conv", ch, ch, 3)
    _ln(sd, f"{vd}.conv_norm_out", bo[0])
    _conv(sd, "text_seg_dec.seg_head", bo[0], 1, 3)
    _conv(sd, "text_seg_dec.recon_head", bo[0], 4, 3)

    # text_dec: HF gpt2 inside + clip_project text_MLP
    from transformers import GPT2Config as HFGPT2Config, GPT2LMHeadModel
    hf = GPT2LMHeadModel(HFGPT2Config(
        vocab_size=GCFG.vocab_size, n_positions=GCFG.n_positions,
        n_embd=GCFG.n_embd, n_layer=GCFG.n_layer, n_head=GCFG.n_head))
    for k, v in hf.state_dict().items():
        sd[f"text_dec.decoder.{k}"] = v
    _lin(sd, "text_dec.clip_project.model.0", BCFG.clip_txt_emb_dim,
         GCFG.n_embd)
    # scheduler buffers that must be ignored
    sd["diffusion_prior.noise_scheduler.betas"] = torch.linspace(0, 1, 5)
    return sd


class TestEnsembleImport:
    @pytest.mark.slow
    def test_full_tree_matches_and_runs(self):
        torch.manual_seed(0)
        sd = _build_reference_sd()
        params, unused = import_neurons_ensemble(
            sd, n_blocks=BCFG.n_blocks, prior_depth=PCFG.depth,
            gpt2_layers=GCFG.n_layer, decoder_up_blocks=3,
            decoder_layers_per_block=1)
        assert unused == [], unused

        model = NeuronsDecoupler(BCFG, PCFG, DCFG, GCFG)
        voxel0 = jnp.zeros((1, 1, BCFG.voxel_counts[0]))
        ref_params = model.init(jax.random.PRNGKey(0), voxel0,
                                jnp.zeros((1, 8), jnp.int32))["params"]
        got, want = _tree_shapes(params), _tree_shapes(ref_params)
        missing = sorted(set(want) - set(got))
        # flax init materializes only the trained subject's ridge head;
        # the checkpoint carries every subject (restore_into overlays)
        extra = sorted(k for k in set(got) - set(want)
                       if not k.startswith("core/ridge/"))
        assert missing == [], f"missing: {missing[:8]}"
        assert extra == [], f"extra: {extra[:8]}"
        mismatched = [k for k in want if got[k] != want[k]]
        assert mismatched == [], \
            [(k, got[k], want[k]) for k in mismatched[:5]]

        from neurons_tpu.utils.checkpoint import restore_into
        params = restore_into(ref_params, params)
        out = model.apply({"params": params}, voxel0,
                          jnp.zeros((1, 8), jnp.int32))
        assert all(np.isfinite(np.asarray(o)).all()
                   for o in jax.tree_util.tree_leaves(out))

    def test_backbone_numerics_match_torch(self):
        torch.manual_seed(1)
        from neurons_tpu.models.brain import BrainBackbone

        tm = TorchMixerBackbone(BCFG.hidden_dim, BCFG.seq_len, BCFG.n_blocks,
                                BCFG.clip_seq_dim * BCFG.clip_emb_dim,
                                BCFG.clip_emb_dim).eval()
        sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
        from neurons_tpu.interop.torch_import import _Tracker, _mixer_backbone
        params = _mixer_backbone(_Tracker(sd), BCFG.n_blocks)
        jm = BrainBackbone(BCFG)
        x = np.random.RandomState(0).randn(
            2, BCFG.seq_len, BCFG.hidden_dim).astype(np.float32)
        with torch.no_grad():
            v_ref, c_ref = tm(torch.tensor(x))
        v, c = jm.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(v), v_ref.numpy(), rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), rtol=2e-4,
                                   atol=2e-4)
