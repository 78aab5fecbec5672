"""Frozen-core artifact contract (ADVICE r4 high).

Mid-run stage-2 checkpoints carry only the trained subtree
(`loop._sans_core`); `loop.run_stage2` therefore writes a one-time
`brain_model_core` artifact so a run killed before the final full-tree
`_last` still leaves a consumable pair on disk. The CLI consumer
(`cli._load_decoupler_params`) must overlay that core when it meets a
sans-core `_last` — and FAIL LOUDLY (not silently generate with a
random core) when no core artifact exists.
"""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from neurons_tpu.utils import checkpoint as ckpt_lib


def _args(tmp_path):
    exp_dir = tmp_path / "EXP"
    (exp_dir / "exp_exp1" / "checkpoints").mkdir(parents=True)
    return types.SimpleNamespace(exp_dir=str(exp_dir), exp="exp1",
                                 weights_dir=str(tmp_path / "weights")), \
        str(exp_dir / "exp_exp1" / "checkpoints")


def _fresh_params():
    return {"core": {"w": jnp.zeros((4,))}, "head": {"w": jnp.zeros((4,))}}


def test_cli_overlays_core_artifact_on_sans_core_last(tmp_path):
    from neurons_tpu.cli import _load_decoupler_params

    args, ckpt_dir = _args(tmp_path)
    ckpt_lib.save_ckpt(ckpt_dir, "brain_model_prior_last",
                       params={"head": {"w": jnp.ones((4,))}})
    ckpt_lib.save_ckpt(ckpt_dir, "brain_model_core",
                       params={"core": {"w": jnp.full((4,), 7.0)}})
    params = _load_decoupler_params(args, _fresh_params(), None, None, None)
    np.testing.assert_allclose(np.asarray(params["head"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(params["core"]["w"]), 7.0), \
        "frozen core must come from brain_model_core, not the fresh init"


def test_cli_overlays_stage1_tag_when_no_core_artifact(tmp_path):
    """Stage-1 tags (`brain_model_last`/`brain_model`) are core-shaped
    payloads; the CLI wraps them under 'core' when using them as the
    frozen-core source."""
    from neurons_tpu.cli import _load_decoupler_params

    args, ckpt_dir = _args(tmp_path)
    ckpt_lib.save_ckpt(ckpt_dir, "brain_model_prior_last",
                       params={"head": {"w": jnp.ones((4,))}})
    ckpt_lib.save_ckpt(ckpt_dir, "brain_model_last",
                       params={"w": jnp.full((4,), 3.0)})
    params = _load_decoupler_params(args, _fresh_params(), None, None, None)
    np.testing.assert_allclose(np.asarray(params["core"]["w"]), 3.0)


def test_cli_fails_loudly_on_sans_core_last_without_core(tmp_path):
    from neurons_tpu.cli import _load_decoupler_params

    args, ckpt_dir = _args(tmp_path)
    ckpt_lib.save_ckpt(ckpt_dir, "brain_model_prior_last",
                       params={"head": {"w": jnp.ones((4,))}})
    with pytest.raises(RuntimeError, match="random core"):
        _load_decoupler_params(args, _fresh_params(), None, None, None)


def test_cli_full_tree_last_needs_no_core_artifact(tmp_path):
    from neurons_tpu.cli import _load_decoupler_params

    args, ckpt_dir = _args(tmp_path)
    ckpt_lib.save_ckpt(ckpt_dir, "brain_model_prior_last",
                       params={"core": {"w": jnp.full((4,), 2.0)},
                               "head": {"w": jnp.ones((4,))}})
    params = _load_decoupler_params(args, _fresh_params(), None, None, None)
    np.testing.assert_allclose(np.asarray(params["core"]["w"]), 2.0)
