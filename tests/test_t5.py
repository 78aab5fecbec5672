"""T5 encoder parity vs HF transformers (reference FrozenT5Embedder /
FrozenByT5Embedder wrap T5EncoderModel — sgm modules.py:249-341)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from neurons_tpu.models import t5 as T5


class TestT5Parity:
    def _hf_model(self):
        from transformers import T5Config as HFT5Config
        from transformers import T5EncoderModel
        hf_cfg = HFT5Config(
            vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=20,
            feed_forward_proj="gated-gelu", dropout_rate=0.0,
            use_cache=False, tie_word_embeddings=False)
        torch.manual_seed(0)
        return T5EncoderModel(hf_cfg).eval(), T5.T5Config(
            vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3,
            num_heads=4, relative_attention_num_buckets=8,
            relative_attention_max_distance=20)

    def test_last_hidden_state_matches(self):
        hf, cfg = self._hf_model()
        params, unused = T5.import_t5_encoder(hf.state_dict(), cfg)
        assert unused == [], unused
        ids = np.array([[5, 9, 17, 43, 1, 0, 0, 0],
                        [88, 3, 1, 0, 0, 0, 0, 0]], np.int64)
        # long sequence exercises both exact and log buckets
        ids_long = np.tile(np.arange(1, 31, dtype=np.int64), (1, 1))
        for batch in (ids, ids_long):
            with torch.no_grad():
                ref = hf(input_ids=torch.tensor(batch)
                         ).last_hidden_state.numpy()
            got = T5.T5Encoder(cfg).apply({"params": params},
                                          jnp.asarray(batch))
            np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                       atol=2e-4)

    def test_byt5_tokenize(self):
        ids = T5.byt5_tokenize(["Ab"], max_length=6)
        # utf-8 bytes + 3, then eos 1, padded 0 (HF ByT5Tokenizer)
        np.testing.assert_array_equal(ids[0], [ord("A") + 3, ord("b") + 3,
                                               1, 0, 0, 0])
        try:
            from transformers import ByT5Tokenizer
        except Exception:
            pytest.skip("ByT5Tokenizer unavailable")
        tok = ByT5Tokenizer()
        hf_ids = tok(["Ab"], padding="max_length", max_length=6,
                     truncation=True)["input_ids"][0]
        np.testing.assert_array_equal(ids[0], hf_ids)

    def test_bucket_function_matches_hf(self):
        from transformers.models.t5.modeling_t5 import T5Attention
        rel = torch.arange(-40, 41)[None]
        ref = T5Attention._relative_position_bucket(
            rel, bidirectional=True, num_buckets=8, max_distance=20)
        got = T5.relative_position_bucket(jnp.asarray(rel.numpy()), 8, 20)
        np.testing.assert_array_equal(np.asarray(got), ref.numpy())
