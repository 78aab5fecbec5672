"""Stage-6 metric suite tests (vs reference eval_metrics.py protocols)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.evaluation import metrics as M


class TestSSIM:
    def test_identity_is_one(self):
        g = np.random.default_rng(0)
        img = (g.uniform(size=(64, 64, 3)) * 255).astype(np.float32)
        mean, std = M.ssim_score(img[None], img[None])
        assert abs(mean - 1.0) < 1e-5

    def test_noise_reduces_ssim(self):
        g = np.random.default_rng(1)
        img = (g.uniform(size=(64, 64, 3)) * 255).astype(np.float32)
        noisy = np.clip(img + g.normal(scale=60, size=img.shape), 0, 255)
        mean, _ = M.ssim_score(img[None], noisy[None].astype(np.float32))
        assert mean < 0.9

    def test_channel_first_accepted(self):
        g = np.random.default_rng(2)
        img = (g.uniform(size=(1, 3, 32, 32)) * 255).astype(np.float32)
        mean, _ = M.ssim_score(img, img)
        assert abs(mean - 1.0) < 1e-5

    def test_constant_shift_high_ssim(self):
        """SSIM is luminance/contrast/structure; identical structure with a
        small shift stays high."""
        g = np.random.default_rng(3)
        img = (g.uniform(size=(64, 64, 3)) * 200 + 20).astype(np.float32)
        mean, _ = M.ssim_score(img[None], (img + 5)[None])
        assert mean > 0.95


class TestPSNR:
    def test_identical_images_large(self):
        img = np.full((16, 16, 3), 128, np.float32)
        m, _ = M.psnr_score(img[None], img[None])
        assert m > 100

    def test_known_value(self):
        a = np.zeros((8, 8, 3), np.float32)
        b = np.full((8, 8, 3), 10.0, np.float32)
        m, _ = M.psnr_score(a[None], b[None])
        expected = 10 * np.log10(255 ** 2 / 100.0)
        np.testing.assert_allclose(m, expected, rtol=1e-4)


class TestNWay:
    def test_perfect_prediction(self):
        pred = np.zeros(100)
        pred[7] = 1.0
        acc, std = M.n_way_top_k_acc(pred, 7, n_way=2, num_trials=50)
        assert acc == 1.0

    def test_chance_level_2way(self):
        rng = np.random.default_rng(5)
        accs = []
        for i in range(50):
            pred = rng.uniform(size=100)
            acc, _ = M.n_way_top_k_acc(pred, int(rng.integers(100)),
                                       n_way=2, num_trials=20,
                                       rng=np.random.default_rng(i))
            accs.append(acc)
        assert 0.35 < np.mean(accs) < 0.65  # ~0.5 chance

    def test_multi_gt_labels(self):
        pred = np.zeros(100)
        pred[3] = 1.0
        # GT set contains 3 -> always correct
        acc, _ = M.n_way_top_k_acc(pred, [3, 50, 60], n_way=2, num_trials=20)
        assert acc == 1.0

    def test_classify_nway_protocol(self):
        """Classifier oracle: pred probs peak at the GT top class."""
        n_cls = 40

        def probs_fn(x):
            p = np.zeros(n_cls)
            p[int(x.sum()) % n_cls] = 1.0
            return p

        def logits_fn(x):
            return probs_fn(x)

        items = [np.full((2, 2), i, np.float32) for i in range(5)]
        accs = M.classify_nway_metric(probs_fn, logits_fn, items, items,
                                      n_way=5, num_trials=10)
        assert np.mean(accs) == 1.0


class TestClipPcc:
    def test_identical_frames_score_one(self):
        def embed(frames):
            return np.tile(np.arange(4.0), (len(frames), 1))

        score, _ = M.clip_pcc(embed, [np.zeros((6, 8, 8, 3))])
        np.testing.assert_allclose(score, 1.0, rtol=1e-6)

    def test_orthogonal_frames_score_zero(self):
        def embed(frames):
            return np.eye(len(frames))

        score, _ = M.clip_pcc(embed, [np.zeros((4, 8, 8, 3))])
        np.testing.assert_allclose(score, 0.0, atol=1e-6)


class TestRemoveOverlap:
    def test_drops_boundary_and_dedups(self):
        pred = np.arange(5)[:, None].repeat(2, 1)
        gt = pred.copy()
        segs = ["a", "a", "b-c", "b", "a"]
        p, g = M.remove_overlap(pred, gt, segs)
        assert len(p) == 4  # drops the '-' entry
        p2, _ = M.remove_overlap(pred, gt, segs, get_scene_seg=True)
        assert len(p2) == 2  # one per scene: a, b


class TestCLIPTowers:
    def test_vision_tower_shapes(self, rng):
        from neurons_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
        cfg = CLIPVisionConfig.tiny()
        m = CLIPVisionTower(cfg)
        x = jax.random.normal(rng, (2, 3, 32, 32))
        params = m.init(rng, x)
        pooled, tokens = m.apply(params, x)
        assert pooled.shape == (2, 24)
        assert tokens.shape == (2, 16, 32)  # (32/8)^2 tokens

    def test_text_tower_pools_at_eot(self, rng):
        from neurons_tpu.models.clip import CLIPTextConfig, CLIPTextTower
        cfg = CLIPTextConfig.tiny()
        m = CLIPTextTower(cfg)
        toks = jnp.asarray([[5, 9, 127, 0, 0, 0]])  # 127 = max id = EOT
        params = m.init(rng, toks)
        last, pooled = m.apply(params, toks)
        assert last.shape == (1, 6, 32)
        assert pooled.shape == (1, 24)
        # padding tokens after EOT must not affect the pooled output
        toks2 = jnp.asarray([[5, 9, 127, 3, 3, 3]])
        _, pooled2 = m.apply(params, toks2)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2),
                                   rtol=2e-2, atol=1e-5)

    def test_preprocess_range(self):
        from neurons_tpu.models.clip import preprocess_images
        x = jnp.ones((1, 3, 16, 16)) * 0.5
        out = preprocess_images(x, size=32)
        assert out.shape == (1, 3, 32, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestViTClassifier:
    def test_image_classifier(self, rng):
        from neurons_tpu.models.vit import ViTClassifier, ViTConfig
        m = ViTClassifier(ViTConfig.tiny(num_classes=10))
        x = jax.random.normal(rng, (2, 3, 32, 32))
        params = m.init(rng, x)
        logits = m.apply(params, x)
        assert logits.shape == (2, 10)

    def test_video_classifier(self, rng):
        from neurons_tpu.models.vit import ViTClassifier, ViTConfig
        cfg = ViTConfig(image_size=32, patch_size=8, width=32, layers=1,
                        heads=4, num_classes=7, tubelet_size=2,
                        num_frames=4, pool="mean")
        m = ViTClassifier(cfg)
        x = jax.random.normal(rng, (2, 4, 3, 32, 32))
        params = m.init(rng, x)
        logits = m.apply(params, x)
        assert logits.shape == (2, 7)
