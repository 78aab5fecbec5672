"""Golden parity: HF ViT / VideoMAE classifier importers vs tiny random
HF models (no network)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from neurons_tpu.interop.torch_import import (import_hf_vit_classifier,
                                              import_videomae_classifier)
from neurons_tpu.models.vit import ViTClassifier, ViTConfig

transformers = pytest.importorskip("transformers")


class TestViTClassifierParity:
    def test_logits_match(self):
        from transformers import ViTConfig as HFViTConfig
        from transformers import ViTForImageClassification

        torch.manual_seed(0)
        hf = ViTForImageClassification(HFViTConfig(
            image_size=32, patch_size=8, hidden_size=24,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, num_labels=5)).eval()
        params, unused = import_hf_vit_classifier(hf.state_dict(), layers=2)
        assert unused == [], unused

        cfg = ViTConfig(image_size=32, patch_size=8, width=24, layers=2,
                        heads=4, num_classes=5, mlp_ratio=2.0)
        jm = ViTClassifier(cfg)
        x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.tensor(x)).logits.numpy()
        got = jm.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4,
                                   atol=3e-4)


class TestVideoMAEClassifierParity:
    def test_logits_match(self):
        from transformers import VideoMAEConfig
        from transformers import VideoMAEForVideoClassification

        torch.manual_seed(0)
        hf = VideoMAEForVideoClassification(VideoMAEConfig(
            image_size=32, patch_size=8, num_channels=3, num_frames=4,
            tubelet_size=2, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=48, num_labels=5,
            use_mean_pooling=True)).eval()
        n_tokens = (4 // 2) * (32 // 8) * (32 // 8)
        params, unused = import_videomae_classifier(hf.state_dict(),
                                                    layers=2,
                                                    num_tokens=n_tokens)
        assert unused == [], unused

        cfg = ViTConfig(image_size=32, patch_size=8, width=24, layers=2,
                        heads=4, num_classes=5, tubelet_size=2, mlp_ratio=2.0,
                        num_frames=4, pool="mean")
        jm = ViTClassifier(cfg)
        # HF expects [B, F, C, H, W]
        x = np.random.RandomState(1).randn(2, 4, 3, 32, 32).astype(
            np.float32)
        with torch.no_grad():
            ref = hf(torch.tensor(x)).logits.numpy()
        got = jm.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4,
                                   atol=3e-4)
