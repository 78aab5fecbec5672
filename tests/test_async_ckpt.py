"""Async checkpoint writer + trained-subtree mid-run saves.

The production endurance runs (tools/train_production.py) save through
`utils.checkpoint.AsyncCkptWriter` so the multi-GB device->host fetch
overlaps compute, and mid-run stage-2 checkpoints carry only the
trained subtree (`loop._sans_core`) — the frozen stage-1 core is
immutable and lives in its own artifact. The END-of-training `_last`
keeps the full tree (the reference's single-file consumption contract,
reference train_neurons.py:48-61). These tests pin: the writer's
round-trip + error surfacing, the mid-save payload shapes, and that a
resume from a trained-subtree `_last` restores the optimizer state
(not the params-only fallback)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurons_tpu.utils import checkpoint as ckpt_lib


def test_async_writer_roundtrip(tmp_path):
    writer = ckpt_lib.AsyncCkptWriter()
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    opt = {"mu": jnp.zeros((2, 3)), "count": jnp.asarray(4)}
    writer.submit(str(tmp_path), "tagA", params=params, opt_state=opt,
                  step=7, epoch=2)
    writer.drain()
    loaded = ckpt_lib.load_ckpt(str(tmp_path), "tagA")
    np.testing.assert_allclose(np.asarray(loaded["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(loaded["opt_state"]["count"]), 4)
    assert int(loaded["step"]) == 7 and int(loaded["epoch"]) == 2
    writer.close()


def test_async_writer_snapshot_decouples_from_mutation(tmp_path):
    """The submit-time device snapshot must protect the write from the
    caller immediately rebinding (donating) its buffers."""
    writer = ckpt_lib.AsyncCkptWriter()
    x = jnp.full((16,), 3.0)
    writer.submit(str(tmp_path), "snap", params={"x": x})
    # simulate the next train step producing a new state; the deleted
    # original must not affect the queued write
    x = x + 1.0
    writer.drain()
    loaded = ckpt_lib.load_ckpt(str(tmp_path), "snap")
    np.testing.assert_allclose(np.asarray(loaded["params"]["x"]), 3.0)
    writer.close()


def test_async_writer_surfaces_errors(tmp_path):
    writer = ckpt_lib.AsyncCkptWriter()
    target = tmp_path / "not_a_dir"
    target.write_text("file, not dir")  # orbax save must fail
    writer.submit(str(target), "tag", params={"x": jnp.ones(2)})
    with pytest.raises(Exception):
        writer.drain()


def _tiny_stage2(tmp_path, mesh8, **kw):
    from neurons_tpu.config import (BrainModelConfig, DecouplerConfig,
                                    PriorConfig, TrainConfig)
    from neurons_tpu.data import cc2017
    from neurons_tpu.models.gpt2 import tiny_gpt2_config
    from neurons_tpu.training.loop import (run_stage2,
                                           synthetic_stage2_batch_builder)

    bcfg = BrainModelConfig(hidden_dim=32, n_blocks=1, clip_seq_dim=16,
                            clip_emb_dim=32, clip_txt_emb_dim=24,
                            subjects=(1,))
    pcfg = PriorConfig(dim=32, depth=1, dim_head=8, heads=4, num_tokens=16,
                       timesteps=5)
    dcfg = DecouplerConfig(n_frames=2, num_classes=51, clip_emb_dim=32,
                           clip_txt_emb_dim=24,
                           decoder_block_out_channels=(8, 8, 8))
    gcfg = tiny_gpt2_config()
    tcfg = TrainConfig(batch_size=8, num_epochs=kw.pop("num_epochs", 2),
                       max_lr=1e-4, neurons_decoupler=True, n_frames=2,
                       num_train_samples=8, ckpt_saving=True)
    split = cc2017.synthetic_split(n=8, n_voxels=bcfg.voxel_counts[0],
                                   n_frames=2, img=16,
                                   txt_dim=bcfg.clip_txt_emb_dim,
                                   n_classes=51, seed=0, train=True)
    builder = synthetic_stage2_batch_builder(bcfg, dcfg, gcfg.vocab_size, 0)
    return run_stage2(bcfg, pcfg, dcfg, tcfg, gcfg, mesh8, split, builder,
                      ckpt_dir=str(tmp_path), image_log_every=0, **kw)


@pytest.mark.slow
def test_stage2_mid_saves_sans_core_resume_restores_opt(tmp_path, mesh8):
    # leg 1: async mid-run saves, preempt after epoch 1 of 3
    state = _tiny_stage2(tmp_path, mesh8, num_epochs=3, last_save_every=1,
                         stop_after_epochs=1, async_saves=True)
    steps_leg1 = int(state.step)
    assert steps_leg1 > 0

    best = ckpt_lib.load_ckpt(str(tmp_path), "brain_model_prior")
    assert "core" not in best["params"], \
        "mid-run best save must carry only the trained subtree"
    assert ckpt_lib.exists(str(tmp_path), "brain_model_core"), \
        "run_stage2 must leave the one-time frozen-core artifact"
    core = ckpt_lib.load_ckpt(str(tmp_path), "brain_model_core")
    assert set(core["params"].keys()) == {"core"}
    last = ckpt_lib.load_ckpt(str(tmp_path), "brain_model_prior_last")
    assert "core" not in last["params"]
    assert last.get("opt_state") is not None, \
        "mid-run _last must carry the optimizer state"

    # leg 2: resume must restore params AND opt_state from the
    # trained-subtree _last (the second template in _restore_state),
    # continue to completion, and finish with a FULL-tree _last
    state2 = _tiny_stage2(tmp_path, mesh8, num_epochs=3, last_save_every=1,
                          resume=True, async_saves=True)
    assert int(state2.step) > steps_leg1
    final = ckpt_lib.load_ckpt(str(tmp_path), "brain_model_prior_last")
    assert "core" in final["params"], \
        "end-of-training _last must keep the full-tree contract"
    assert int(final["epoch"]) == 2


def test_restore_state_prefers_opt_state_on_sans_core_ckpt(tmp_path):
    """_restore_state must take the trained-subtree template path (and
    keep the checkpoint's opt_state/step), not the params-only
    fallback."""
    from neurons_tpu.training.loop import _restore_state, _sans_core

    class State:
        def __init__(self, params, opt_state, step):
            self.params, self.opt_state, self.step = params, opt_state, step

    params = {"core": {"w": jnp.zeros((4,))},
              "head": {"w": jnp.zeros((4,))}}
    opt = {"mu": {"head": {"w": jnp.zeros((4,))}},
           "count": jnp.asarray(0)}
    saved_opt = {"mu": {"head": {"w": jnp.full((4,), 5.0)}},
                 "count": jnp.asarray(9)}
    ckpt_lib.save_ckpt(str(tmp_path), "brain_model_prior_last",
                       params=_sans_core({"core": params["core"],
                                          "head": {"w": jnp.ones((4,))}}),
                       opt_state=saved_opt, step=9, epoch=3)
    state = State(params, opt, jnp.asarray(0))
    new_state, start_epoch, extra = _restore_state(
        str(tmp_path), "brain_model_prior_last", state, State)
    assert start_epoch == 4
    assert int(np.asarray(new_state.opt_state["count"])) == 9, \
        "opt_state must come from the checkpoint, not the fallback"
    np.testing.assert_allclose(np.asarray(new_state.params["head"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(new_state.params["core"]["w"]), 0.0)


def test_restore_state_memory_contract(tmp_path):
    """Resume must never double-materialize the state on device: the
    round-4 endurance run OOM'd in `_restore_state` by device-putting a
    full restored params+opt copy while the init state was resident
    (/tmp/train_stage2.log RESOURCE_EXHAUSTED). Pins the free-before-
    put contract at tiny dims via the restore accounting: peak device
    bytes ABOVE the init state stay < one replaced subtree (here: one
    leaf), and every replaced init leaf is actually deleted."""
    from neurons_tpu.training import loop

    class State:
        def __init__(self, params, opt_state, step):
            self.params, self.opt_state, self.step = params, opt_state, step

    n = 1024  # 4 KB leaves: big enough that accounting is unambiguous
    params = {"core": {"w": jnp.zeros((n,))},
              "head": {"w": jnp.zeros((n,))},
              "prior": {"w": jnp.zeros((n,))}}
    opt = {"mu": {"head": {"w": jnp.zeros((n,))},
                  "prior": {"w": jnp.zeros((n,))}},
           "count": jnp.asarray(0)}
    ckpt_lib.save_ckpt(str(tmp_path), "brain_model_prior_last",
                       params={"head": {"w": jnp.ones((n,))},
                               "prior": {"w": jnp.ones((n,))}},
                       opt_state=opt, step=3, epoch=1)
    state = State(params, opt, jnp.asarray(0))
    init_head, init_prior = params["head"]["w"], params["prior"]["w"]
    init_core = params["core"]["w"]
    new_state, _, _ = loop._restore_state(
        str(tmp_path), "brain_model_prior_last", state, State)
    stats = loop.LAST_RESTORE_STATS
    leaf_bytes = n * 4
    # free-before-put: at no point may more than ~one leaf of restored
    # data sit on device on top of the (shrinking) init state
    assert stats["peak_extra_bytes"] <= leaf_bytes, stats
    assert stats["put_bytes"] >= 2 * leaf_bytes  # head+prior(+opt)
    assert stats["freed_bytes"] >= stats["put_bytes"] - leaf_bytes
    assert init_head.is_deleted() and init_prior.is_deleted(), \
        "replaced init leaves must be freed"
    assert not init_core.is_deleted(), \
        "the frozen core (absent from the sans-core payload) is kept"
    np.testing.assert_allclose(
        np.asarray(new_state.params["head"]["w"]), 1.0)


def test_restore_state_survives_extra_payload(tmp_path):
    """`_last` saves now persist the best-metric watermark in `extra`;
    the metadata-driven template must restore such payloads (and hand
    the extras back) without tripping structure mismatch."""
    from neurons_tpu.training.loop import _best_extra, _restore_state

    class State:
        def __init__(self, params, opt_state, step):
            self.params, self.opt_state, self.step = params, opt_state, step

    params = {"head": {"w": jnp.zeros((4,))}}
    opt = {"mu": jnp.zeros((4,)), "count": jnp.asarray(0)}
    ckpt_lib.save_ckpt(str(tmp_path), "brain_model_last",
                       params={"head": {"w": jnp.ones((4,))}},
                       opt_state=opt, step=5, epoch=2,
                       extra=_best_extra(1.25, 1))
    state = State(params, opt, jnp.asarray(0))
    new_state, start_epoch, extra = _restore_state(
        str(tmp_path), "brain_model_last", state, State)
    assert start_epoch == 3
    assert float(extra["best_metric"]) == 1.25
    assert int(extra["best_epoch"]) == 1
