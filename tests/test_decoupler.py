"""Stage-2 decoupler tests: decoder shapes, GPT-2 captioner, and one full
jitted train step with all seven losses on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.config import (BrainModelConfig, DecouplerConfig,
                                PriorConfig, TrainConfig)
from neurons_tpu.models.gpt2 import TextDecoder, tiny_gpt2_config


BCFG = BrainModelConfig(hidden_dim=32, n_blocks=1, seq_len=1, clip_seq_dim=16,
                        clip_emb_dim=32, clip_txt_emb_dim=24, subjects=(3,))
PCFG = PriorConfig(dim=32, depth=1, dim_head=8, heads=4, num_tokens=16,
                   timesteps=5)
DCFG = DecouplerConfig(n_frames=2, num_classes=7, clip_emb_dim=32,
                       clip_txt_emb_dim=24,
                       decoder_block_out_channels=(8, 8, 8))
TCFG = TrainConfig(batch_size=8, num_epochs=5, max_lr=1e-3)


class TestTextDrivenDecoder:
    def test_seg_and_recon_shapes(self, rng):
        from neurons_tpu.models.decoder_video import TextDrivenDecoder
        m = TextDrivenDecoder(clip_vision_emb_dim=32, clip_txt_emb_dim=24,
                              decoder_block_out_channels=(8, 8, 8))
        vision = jax.random.normal(rng, (4, 16, 32))  # B'=4, N=16 (4x4 grid)
        text = jax.random.normal(jax.random.fold_in(rng, 1), (2, 24))
        params = m.init(rng, vision, text, time=2)
        seg = m.apply(params, vision, text, time=2)
        # 4x4 grid upsampled twice (3 blocks, last no upsample) -> 16x16
        assert seg.shape == (4, 1, 16, 16)
        rec = m.apply(params, vision, text, time=2, is_seg=False)
        assert rec.shape == (4, 4, 16, 16)
        both = m.apply(params, vision, text, time=2, return_all=True)
        assert both[0].shape == (4, 1, 16, 16)
        assert both[1].shape == (4, 4, 16, 16)

    def test_no_text_path(self, rng):
        from neurons_tpu.models.decoder_video import TextDrivenDecoder
        m = TextDrivenDecoder(clip_vision_emb_dim=32, clip_txt_emb_dim=24,
                              decoder_block_out_channels=(8, 8, 8))
        vision = jax.random.normal(rng, (2, 16, 32))
        params = m.init(rng, vision, None, time=1)
        seg = m.apply(params, vision, None, time=1)
        assert seg.shape == (2, 1, 16, 16)

    def test_temporal_blend_weight_exists(self, rng):
        from neurons_tpu.models.decoder_video import TextDrivenDecoder
        m = TextDrivenDecoder(clip_vision_emb_dim=32, clip_txt_emb_dim=24,
                              decoder_block_out_channels=(8, 8, 8))
        vision = jax.random.normal(rng, (4, 16, 32))
        params = m.init(rng, vision, None, time=2)
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = ["/".join(str(getattr(p, "key", p)) for p in path)
                 for path, _ in flat]
        assert any("blend_weight" in n for n in names)


class TestGPT2:
    def test_lm_logits_shape(self, rng):
        cfg = tiny_gpt2_config()
        m = TextDecoder(cfg, prefix_size=24)
        clip_feat = jax.random.normal(rng, (3, 24))
        tokens = jnp.ones((3, 10), jnp.int32)
        params = m.init(rng, clip_feat, tokens)
        logits = m.apply(params, clip_feat, tokens)
        assert logits.shape == (3, 11, cfg.vocab_size)

    def test_causality(self, rng):
        """Changing a later token must not affect earlier logits."""
        cfg = tiny_gpt2_config()
        m = TextDecoder(cfg, prefix_size=24)
        clip_feat = jax.random.normal(rng, (1, 24))
        t1 = jnp.array([[5, 6, 7, 8]], jnp.int32)
        t2 = jnp.array([[5, 6, 99, 100]], jnp.int32)
        params = m.init(rng, clip_feat, t1)
        l1 = m.apply(params, clip_feat, t1)
        l2 = m.apply(params, clip_feat, t2)
        np.testing.assert_allclose(np.asarray(l1[:, :2]),
                                   np.asarray(l2[:, :2]), atol=1e-5)
        assert not np.allclose(np.asarray(l1[:, 3]), np.asarray(l2[:, 3]))

    def test_greedy_decode_stops_at_eot(self, rng):
        cfg = tiny_gpt2_config()
        m = TextDecoder(cfg, prefix_size=24)
        clip_feat = jax.random.normal(rng, (2, 24))
        params = m.init(rng, clip_feat, jnp.ones((2, 4), jnp.int32))
        eot = 3
        toks = m.apply(params, clip_feat, 12, eot,
                       method=TextDecoder.greedy_decode)
        toks = np.asarray(toks)
        assert toks.shape == (2, 12)
        for row in toks:
            hits = np.where(row == eot)[0]
            if len(hits):
                # everything after first EOT is EOT (stop masking)
                assert (row[hits[0]:] == eot).all()


@pytest.mark.slow
class TestStage2Step:
    @pytest.fixture(scope="class")
    def setup(self):
        from neurons_tpu.models.gpt2 import GPT2Config
        from neurons_tpu.training import train_decoupler as td

        gcfg = tiny_gpt2_config()
        bundle, state = td.init_stage2(BCFG, PCFG, DCFG, TCFG, gcfg,
                                       steps_per_epoch=2,
                                       key=jax.random.PRNGKey(0))
        step = td.make_stage2_train_step(bundle, TCFG, DCFG, steps_per_epoch=2)
        return bundle, state, step, gcfg

    def test_full_step(self, setup, mesh8):
        from neurons_tpu.parallel import shard_batch
        bundle, state, step, gcfg = setup
        B, F, N, C = 8, DCFG.n_frames, BCFG.clip_seq_dim, BCFG.clip_emb_dim
        g = np.random.default_rng(0)
        batch = {
            "voxel": g.normal(size=(B, 1, BCFG.voxel_counts[0])).astype(np.float32),
            "clip_vision_target": g.normal(size=(B, N, C)).astype(np.float32),
            "clip_video_target": g.normal(size=(B, F, N, C)).astype(np.float32),
            "text_emb": g.normal(size=(B, BCFG.clip_txt_emb_dim)).astype(np.float32),
            "key_obj_text_embed": g.normal(size=(B, DCFG.clip_txt_emb_dim)).astype(np.float32),
            "key_obj_masks": (g.uniform(size=(B, F, 32, 32)) < 0.3).astype(np.float32),
            "cls_label": (g.uniform(size=(B, DCFG.num_classes)) < 0.2).astype(np.float32),
            "clip_tokens": g.integers(1, gcfg.vocab_size, size=(B, 12)).astype(np.int32),
            "vae_latents": g.normal(size=(B, F, 4, 8, 8)).astype(np.float32),
        }
        batch = shard_batch(mesh8, batch)
        # the step DONATES the state (HBM); copy what we assert on first
        core_before = np.asarray(
            jax.tree_util.tree_leaves(state.params["core"])[0])
        p_before = np.asarray(
            jax.tree_util.tree_leaves(state.params["prior_net"])[0])
        state2, metrics = step(state, jax.random.PRNGKey(1), batch,
                               jnp.asarray(0), jnp.asarray(0),
                               jnp.asarray(0.005))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        # all seven loss components present
        for k in ["loss_prior", "loss_clip_vision", "loss_clip_txt",
                  "loss_key_obj_seg", "loss_multi_cls", "loss_text_gen",
                  "loss_recon_video"]:
            assert k in metrics
        # frozen core untouched
        core_after = jax.tree_util.tree_leaves(state2.params["core"])[0]
        np.testing.assert_array_equal(core_before, np.asarray(core_after))
        # trainable heads moved
        p_after = jax.tree_util.tree_leaves(state2.params["prior_net"])[0]
        assert not np.allclose(p_before, np.asarray(p_after))
