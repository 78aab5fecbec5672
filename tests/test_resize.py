"""Golden parity of the saved-artifact resize vs torch itself.

The reference saves stage-3 recons through transforms.Resize((256,256))
on a tensor under torchvision 0.16.0 (recon_keyframe_neurons.py:443-444)
— which is F.interpolate(mode='bilinear', align_corners=False,
antialias=False) in that version ('warn'-era default). Both semantics
must match torch tap-for-tap since SSIM/PSNR are computed on the
resized artifacts (run_metrics.py:99-110)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from neurons_tpu.ops.resize import resize_reference


def _torch_resize(x, out_hw, antialias):
    return F.interpolate(torch.from_numpy(x), out_hw, mode="bilinear",
                         align_corners=False, antialias=antialias).numpy()


class TestResizeReference:
    @pytest.mark.parametrize("in_hw", [(768, 768), (512, 512), (96, 96),
                                       (240, 320), (256, 256)])
    @pytest.mark.parametrize("antialias", [False, True])
    def test_torch_parity(self, in_hw, antialias):
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(2, 3, *in_hw)).astype(np.float32)
        want = _torch_resize(x, (256, 256), antialias)
        got = np.asarray(resize_reference(jnp.asarray(x), (256, 256),
                                          antialias=antialias))
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)

    def test_video_axes(self):
        # 5D [N, F, 3, H, W] resizes each frame like the flattened 4D
        rng = np.random.default_rng(1)
        x = rng.uniform(size=(1, 4, 3, 64, 64)).astype(np.float32)
        want = _torch_resize(x.reshape(4, 3, 64, 64), (32, 32),
                             False).reshape(1, 4, 3, 32, 32)
        got = np.asarray(resize_reference(jnp.asarray(x), (32, 32)))
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)

    def test_identity_passthrough(self):
        x = jnp.ones((1, 3, 8, 8))
        assert resize_reference(x, (8, 8)) is x

    def test_dtype_preserved(self):
        x = jnp.ones((1, 3, 16, 16), jnp.bfloat16)
        y = resize_reference(x, (8, 8), antialias=True)
        assert y.dtype == jnp.bfloat16


class TestResizeNp:
    """Host-numpy twin: same taps as the device path (shared weight
    builders), used by the stage-5 GT panel composition (cli.py)."""

    @pytest.mark.parametrize("in_hw", [(224, 224), (96, 96), (240, 320)])
    @pytest.mark.parametrize("antialias", [False, True])
    def test_matches_torch_and_device(self, in_hw, antialias):
        from neurons_tpu.ops.resize import resize_np
        rng = np.random.default_rng(2)
        x = rng.uniform(size=(6, 3, *in_hw)).astype(np.float32)
        want = _torch_resize(x, (256, 256), antialias)
        got = resize_np(x, (256, 256), antialias=antialias)
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
        dev = np.asarray(resize_reference(jnp.asarray(x), (256, 256),
                                          antialias=antialias))
        np.testing.assert_allclose(got, dev, atol=2e-6, rtol=1e-5)

    def test_identity_and_dtype(self):
        from neurons_tpu.ops.resize import resize_np
        x = np.ones((2, 3, 8, 8), np.float16)
        assert resize_np(x, (8, 8)) is x
        y = resize_np(x, (4, 4))
        assert y.dtype == np.float16
