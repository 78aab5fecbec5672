"""BLIP-2 captioner: golden parity vs a tiny HF Blip2ForConditionalGeneration
(randomly initialised — no network), plus greedy-decode smoke."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch


from neurons_tpu.interop.torch_import import import_blip2
from neurons_tpu.models.blip2 import Blip2Captioner, Blip2Config

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair():
    from transformers import (Blip2Config as HFBlip2Config,
                              Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig,
                              OPTConfig)

    cfg = Blip2Config.tiny()
    hf_cfg = HFBlip2Config.from_vision_qformer_text_configs(
        Blip2VisionConfig(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          patch_size=8, image_size=32),
        Blip2QFormerConfig(hidden_size=24, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=48,
                           cross_attention_frequency=2,
                           encoder_hidden_size=32),
        OPTConfig(hidden_size=40, num_hidden_layers=2, num_attention_heads=4,
                  ffn_dim=80, vocab_size=100, max_position_embeddings=64,
                  do_layer_norm_before=True, word_embed_proj_dim=40),
        num_query_tokens=4)
    torch.manual_seed(0)
    hf = Blip2ForConditionalGeneration(hf_cfg).eval()
    params, unused = import_blip2(hf.state_dict(), cfg)
    assert unused == [], unused
    return hf, Blip2Captioner(cfg), params


class TestBlip2Parity:
    def test_teacher_forced_logits_match(self, pair):
        hf, jm, params = pair
        rs = np.random.RandomState(0)
        pix = rs.randn(2, 3, 32, 32).astype(np.float32)
        ids = rs.randint(0, 100, (2, 7)).astype(np.int64)

        with torch.no_grad():
            img = hf.vision_model(torch.tensor(pix)).last_hidden_state
            q = hf.query_tokens.expand(2, -1, -1)
            qo = hf.qformer(query_embeds=q, encoder_hidden_states=img
                            ).last_hidden_state
            proj = hf.language_projection(qo)
            tok = hf.language_model.model.decoder.embed_tokens(
                torch.tensor(ids))
            emb = torch.cat([proj, tok], dim=1)
            ref = hf.language_model(
                inputs_embeds=emb,
                attention_mask=torch.ones(emb.shape[:2], dtype=torch.long)
            ).logits.numpy()

        got = jm.apply({"params": params}, jnp.asarray(pix),
                       jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4,
                                   atol=2e-4)

    def test_greedy_generate_runs(self, pair):
        _, jm, params = pair
        pix = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
        toks = jm.apply({"params": params}, jnp.asarray(pix), max_len=6,
                        method=Blip2Captioner.generate)
        toks = np.asarray(toks)
        assert toks.shape == (2, 6)
        assert (toks[:, 0] == 2).all()  # BOS
        assert toks.dtype == np.int32

    def test_kv_cached_generate_matches_nocache(self, pair):
        """The KV-cached decode must be token-exact vs the full-recompute
        oracle (masked softmax excludes the cache's unwritten slots)."""
        _, jm, params = pair
        pix = np.random.RandomState(2).randn(3, 3, 32, 32).astype(np.float32)
        for max_len in (1, 2, 8):
            cached = jm.apply({"params": params}, jnp.asarray(pix),
                              max_len=max_len,
                              method=Blip2Captioner.generate)
            full = jm.apply({"params": params}, jnp.asarray(pix),
                            max_len=max_len,
                            method=Blip2Captioner.generate_nocache)
            np.testing.assert_array_equal(np.asarray(cached),
                                          np.asarray(full))
