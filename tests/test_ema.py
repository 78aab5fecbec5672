"""EMA: LitEma-parity decay math + the LDM ema-weight swap."""

import numpy as np
import jax.numpy as jnp

from neurons_tpu.interop.torch_import import ldm_apply_ema
from neurons_tpu.utils import ema


def test_decay_schedule_matches_litema():
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    st = ema.init(params, decay=0.999)
    # torch LitEma: one_minus_decay = 1 - min(decay, (1+n)/(10+n));
    # shadow -= one_minus_decay * (shadow - param)
    shadow_ref = {k: np.asarray(v, np.float64) for k, v in params.items()}
    new_params = {"w": jnp.full((3,), 2.0), "b": jnp.full((2,), -1.0)}
    for step in range(1, 4):
        st = ema.update(st, new_params)
        d = min(0.999, (1 + step) / (10 + step))
        for k in shadow_ref:
            shadow_ref[k] = shadow_ref[k] - (1 - d) * (
                shadow_ref[k] - np.asarray(new_params[k], np.float64))
    for k in shadow_ref:
        np.testing.assert_allclose(np.asarray(st.shadow[k]), shadow_ref[k],
                                   rtol=1e-6)
    assert int(st.num_updates) == 3


def test_swap_returns_shadow_and_live():
    params = {"w": jnp.ones((2,))}
    st = ema.init(params)
    st = ema.update(st, {"w": jnp.full((2,), 5.0)})
    run_with, restore = ema.swap(st, params)
    assert np.allclose(np.asarray(run_with["w"]), np.asarray(st.shadow["w"]))
    assert restore is params


def test_ldm_apply_ema_swaps_unet_weights():
    sd = {
        "model.diffusion_model.input_blocks.0.0.weight": np.zeros((2,)),
        "model.diffusion_model.out.2.bias": np.zeros((3,)),
        "first_stage_model.encoder.conv_in.weight": np.zeros((4,)),
        "model_ema.diffusion_modelinput_blocks00weight": np.ones((2,)),
        "model_ema.diffusion_modelout2bias": np.ones((3,)),
        "model_ema.num_updates": np.array(100),
        "model_ema.decay": np.array(0.9999),
    }
    out, swapped = ldm_apply_ema(sd)
    assert swapped == 2
    assert (out["model.diffusion_model.input_blocks.0.0.weight"] == 1).all()
    assert (out["model.diffusion_model.out.2.bias"] == 1).all()
    # non-model keys untouched
    assert (out["first_stage_model.encoder.conv_in.weight"] == 0).all()
