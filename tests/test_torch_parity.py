"""Golden numerical-parity tests: flax ports vs real torch modules.

transformers/torch are installed (CPU), so we instantiate tiny
architecture-only models (no downloads), import their random weights
through interop.torch_import, and require logits to match at fp32
tolerance — the strongest offline evidence that the weight mapping AND the
module math are right (SURVEY.md hard-part #1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


class TestGPT2Parity:
    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

        hf_cfg = HFConfig(vocab_size=96, n_positions=32, n_embd=32,
                          n_layer=2, n_head=4, activation_function="gelu_new",
                          resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
        torch.manual_seed(0)
        hf = GPT2LMHeadModel(hf_cfg).eval()

        from neurons_tpu.interop.torch_import import import_gpt2
        from neurons_tpu.models.gpt2 import GPT2Config, TextDecoder

        lm_params, unused = import_gpt2(hf.state_dict(), n_layer=2)
        assert unused == [], f"unmapped keys: {unused}"

        cfg = GPT2Config(vocab_size=96, n_positions=32, n_embd=32,
                         n_layer=2, n_head=4)
        dec = TextDecoder(cfg, prefix_size=16)
        rng = jax.random.PRNGKey(0)
        clip_feat = jnp.zeros((2, 16))
        toks = jnp.ones((2, 6), jnp.int32)
        params = dec.init(rng, clip_feat, toks)["params"]
        # graft the imported LM weights; keep our clip_project
        params = dict(params)
        params["wte"] = jnp.asarray(lm_params["wte"])
        params["lm"] = jax.tree_util.tree_map(jnp.asarray, lm_params["lm"])
        return hf, dec, params

    def test_lm_logits_match(self, pair):
        hf, dec, params = pair
        tokens = np.array([[5, 17, 3, 88, 1, 0], [9, 9, 2, 4, 60, 12]])
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(tokens)).logits.numpy()

        # drive our LM directly with token embeddings (no prefix) by
        # passing a zero clip feature and comparing positions 1..T of our
        # output against the torch positions 0..T-1 is NOT equivalent
        # (positions shift). Instead call the inner LM exactly.
        from neurons_tpu.models.gpt2 import _InnerLM, GPT2Config
        cfg = GPT2Config(vocab_size=96, n_positions=32, n_embd=32,
                         n_layer=2, n_head=4)
        inner = _InnerLM(cfg)
        wte = params["wte"]
        emb = wte[jnp.asarray(tokens)]
        ours = inner.apply({"params": params["lm"]}, emb, wte)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4,
                                   atol=2e-4)


class TestHFCLIPVisionParity:
    def test_vision_features_match(self):
        from transformers import CLIPVisionConfig as HFVC
        from transformers import CLIPVisionModelWithProjection

        hf_cfg = HFVC(hidden_size=32, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      image_size=32, patch_size=8, projection_dim=24,
                      hidden_act="gelu")
        torch.manual_seed(1)
        hf = CLIPVisionModelWithProjection(hf_cfg).eval()

        from neurons_tpu.interop.torch_import import import_hf_clip_vision
        from neurons_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower

        params, unused = import_hf_clip_vision(hf.state_dict(), layers=2)
        assert unused == [], f"unmapped: {unused}"

        cfg = CLIPVisionConfig(image_size=32, patch_size=8, width=32,
                               layers=2, heads=4, mlp_ratio=4.0,
                               output_dim=24, quick_gelu=False)
        tower = CLIPVisionTower(cfg)
        x = np.random.default_rng(2).normal(size=(2, 3, 32, 32)
                                            ).astype(np.float32)
        with torch.no_grad():
            ref = hf(pixel_values=torch.tensor(x)).image_embeds.numpy()
        pooled, _ = tower.apply({"params": jax.tree_util.tree_map(
            jnp.asarray, params)}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(pooled), ref, rtol=2e-3,
                                   atol=2e-4)


class TestLoRAMath:
    def test_linear_merge(self):
        g = np.random.default_rng(0)
        w = g.normal(size=(8, 8)).astype(np.float32)
        up = g.normal(size=(8, 2)).astype(np.float32)
        down = g.normal(size=(2, 8)).astype(np.float32)
        from neurons_tpu.interop.torch_import import merge_lora
        out = merge_lora(w, up, down, alpha=0.5)
        np.testing.assert_allclose(out, w + 0.5 * up @ down, rtol=1e-6)

    def test_conv_merge(self):
        g = np.random.default_rng(1)
        w = g.normal(size=(8, 4, 1, 1)).astype(np.float32)
        up = g.normal(size=(8, 2, 1, 1)).astype(np.float32)
        down = g.normal(size=(2, 4, 1, 1)).astype(np.float32)
        from neurons_tpu.interop.torch_import import merge_lora
        out = merge_lora(w, up, down, alpha=1.0)
        expected = w + (up.squeeze() @ down.squeeze())[:, :, None, None]
        np.testing.assert_allclose(out, expected, rtol=1e-6)


class TestMotionModuleFilter:
    def test_filters_and_drops_pe(self):
        from neurons_tpu.interop.torch_import import filter_motion_module
        sd = {
            "down_blocks.0.motion_modules.0.proj_in.weight": 1,
            "down_blocks.0.motion_modules.0.pos_encoder.pe": 2,
            "down_blocks.0.resnets.0.conv1.weight": 3,
        }
        out = filter_motion_module(sd)
        assert list(out.keys()) == [
            "down_blocks.0.motion_modules.0.proj_in.weight"]


class TestHFCLIPTextParity:
    """import_hf_clip_text vs a tiny random HF CLIPTextModel (the SD-1.5
    text encoder layout, QuickGELU)."""

    def test_last_hidden_matches(self):
        import torch
        from transformers import CLIPTextConfig as HFTextConfig
        from transformers import CLIPTextModel
        from neurons_tpu.interop.torch_import import import_hf_clip_text
        from neurons_tpu.models.clip import CLIPTextConfig, CLIPTextTower
        from neurons_tpu.utils.checkpoint import restore_into

        torch.manual_seed(0)
        hf = CLIPTextModel(HFTextConfig(
            vocab_size=120, hidden_size=24, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, hidden_act="quick_gelu")).eval()
        params, unused = import_hf_clip_text(hf.state_dict(), layers=2)
        assert unused == [], unused

        cfg = CLIPTextConfig(vocab_size=120, context_length=16, width=24,
                             layers=2, heads=4, output_dim=24,
                             quick_gelu=True)
        tower = CLIPTextTower(cfg)
        init_p = tower.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        params = restore_into(init_p, params)

        ids = np.random.RandomState(0).randint(1, 119, (2, 9))
        ids[:, -1] = 119  # highest id = EOT position
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
        last, _ = tower.apply({"params": params}, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(last), ref, rtol=3e-4,
                                   atol=3e-4)


class TestMotionProjParity:
    """The (c f) channel-major split + grid routing is parity-critical
    (a silent (f c) transpose would pass every shape/behavior test)."""

    def test_matches_reference_rearranges(self):
        import torch
        import torch.nn as tnn
        from neurons_tpu.models.brain import MotionProj

        c, f, n = 8, 3, 16
        torch.manual_seed(0)
        lin = tnn.Linear(c, c * f)
        x = torch.randn(2, n, c)
        with torch.no_grad():
            m = lin(x)
            # reference :127-138: b n (c f) -> b c f n -> b c f h w ->
            # b f (h w) c
            m = m.reshape(2, n, c, f).permute(0, 2, 3, 1)
            ref = m.permute(0, 2, 3, 1).numpy()

        jm = MotionProj(n_frames=f, clip_size=c)
        params = {"motion_proj": {"kernel": lin.weight.detach().numpy().T,
                                  "bias": lin.bias.detach().numpy()}}
        got = jm.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5,
                                   atol=1e-6)
