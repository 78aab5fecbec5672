"""Native GIF codec + parallel reader: round-trip and cross-check vs
imageio. Skips when the toolchain/library is unavailable."""

import os
import tempfile

import numpy as np
import pytest

from neurons_tpu import native_io

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native library not built")


def _gradient_video(f=4, h=24, w=32):
    y, x = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(f):
        r = (x * 255 // max(1, w - 1)).astype(np.uint8)
        g = (y * 255 // max(1, h - 1)).astype(np.uint8)
        b = np.full((h, w), 40 * i, np.uint8)
        frames.append(np.stack([r, g, b], -1))
    return np.stack(frames)


class TestGifCodec:
    def test_round_trip_near_lossless_on_few_colors(self):
        # <=256 distinct colors -> palette covers them near-exactly
        v = np.zeros((3, 16, 16, 3), np.uint8)
        v[0, :8] = [255, 0, 0]
        v[1, :, :8] = [0, 255, 0]
        v[2, 8:] = [0, 0, 255]
        data = native_io.encode_gif(v, delay_ms=100)
        assert data is not None and data[:6] == b"GIF89a"
        back = native_io.decode_gif(data)
        assert back is not None and back.shape == v.shape
        assert np.abs(back.astype(int) - v.astype(int)).max() <= 8

    def test_gradient_round_trip_small_error(self):
        v = _gradient_video()
        data = native_io.encode_gif(v)
        back = native_io.decode_gif(data)
        assert back.shape == v.shape
        err = np.abs(back.astype(int) - v.astype(int)).mean()
        assert err < 12.0, err  # palette quantization error budget

    def test_imageio_can_read_our_gifs(self):
        imageio = pytest.importorskip("imageio")
        v = _gradient_video()
        data = native_io.encode_gif(v, delay_ms=125)
        with tempfile.NamedTemporaryFile(suffix=".gif", delete=False) as fh:
            fh.write(data)
            path = fh.name
        try:
            frames = imageio.mimread(path)
            assert len(frames) == v.shape[0]
            assert frames[0].shape[:2] == v.shape[1:3]
        finally:
            os.unlink(path)

    def test_we_can_read_imageio_gifs(self):
        imageio = pytest.importorskip("imageio")
        v = _gradient_video()
        with tempfile.NamedTemporaryFile(suffix=".gif", delete=False) as fh:
            path = fh.name
        try:
            imageio.mimsave(path, list(v), duration=125, loop=0)
            back = native_io.decode_gif(open(path, "rb").read())
            if back is None:  # exotic encoding: python fallback covers it
                pytest.skip("imageio produced a feature we don't fast-path")
            assert back.shape[0] == v.shape[0]
            assert back.shape[1:3] == v.shape[1:3]
        finally:
            os.unlink(path)


class TestParallelRead:
    def test_reads_byte_ranges(self):
        files = []
        try:
            for i in range(4):
                fh = tempfile.NamedTemporaryFile(delete=False)
                fh.write(bytes(range(256)) * (i + 1))
                fh.close()
                files.append(fh.name)
            paths = files
            offsets = [0, 16, 256, 0]
            sizes = [256, 64, 128, 1024]
            out = native_io.parallel_read(paths, offsets, sizes)
            assert out is not None
            assert bytes(out[0]) == bytes(range(256))
            assert bytes(out[1]) == bytes(range(16, 80))
            assert bytes(out[2]) == bytes(range(128))
            assert len(out[3]) == 1024
        finally:
            for f in files:
                os.unlink(f)

    def test_missing_file_returns_none(self):
        out = native_io.parallel_read(["/nonexistent/x"], [0], [8])
        assert out is None


class TestPipelineIntegration:
    def test_save_and_load_video_grid_native(self, tmp_path):
        from neurons_tpu.pipelines import io

        v = np.random.default_rng(0).uniform(
            size=(2, 4, 3, 16, 16)).astype(np.float32)
        p = str(tmp_path / "clip.gif")
        io.save_video_grid(v, p, fps=8)
        back = io.load_gif(p)
        assert back.shape == (4, 16, 32, 3)  # 2 videos side by side
