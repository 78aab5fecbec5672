"""Serving layer: batching scheduler semantics (coalescing, fixed-batch
padding, error routing) and the HTTP surface — with an injected fake
pipeline, so no device or model build is involved. The real-pipeline
wiring (`build_bench_pipeline`) reuses bench.build(), which the bench
and e2e suites exercise."""

import http.client
import io
import json
import threading

import numpy as np
import pytest

from neurons_tpu.serving import (BatchingScheduler, InferenceServer,
                                 ServerConfig)

N_VOX = 16
F, H, W = 2, 4, 4


class FakePipeline:
    """video[b, ...] = mean(voxels[b]) everywhere — lets tests check
    per-request routing through a shared batch."""

    def __init__(self):
        self.calls = []

    def __call__(self, voxels, seed):
        self.calls.append(np.array(voxels))
        vid = np.ones((voxels.shape[0], F, 3, H, W), np.float32)
        return vid * voxels.mean(axis=1)[:, None, None, None, None]


def make(batch_size=1, max_wait_ms=0.0, max_queue=64):
    fp = FakePipeline()
    sched = BatchingScheduler(fp, N_VOX, ServerConfig(
        batch_size=batch_size, max_wait_ms=max_wait_ms,
        max_queue=max_queue))
    return fp, sched


class TestScheduler:
    def test_single_request_roundtrip(self):
        fp, sched = make()
        try:
            vox = np.full((N_VOX,), 0.25, np.float32)
            out = sched.submit(vox, timeout=10)
            assert out.shape == (1, F, 3, H, W)
            np.testing.assert_allclose(out, 0.25, rtol=1e-6)
            assert sched.served == 1
        finally:
            sched.close()

    def test_padding_is_discarded(self):
        fp, sched = make(batch_size=4)
        try:
            out = sched.submit(np.full((2, N_VOX), 0.5, np.float32),
                               timeout=10)
            assert out.shape == (2, F, 3, H, W)
            # the pipeline saw the full padded batch
            assert fp.calls[0].shape == (4, N_VOX)
            np.testing.assert_allclose(fp.calls[0][2:], 0.0)
        finally:
            sched.close()

    def test_concurrent_requests_coalesce(self):
        fp, sched = make(batch_size=4, max_wait_ms=500.0)
        try:
            results = {}

            def post(tag, value):
                results[tag] = sched.submit(
                    np.full((1, N_VOX), value, np.float32), timeout=20)

            t1 = threading.Thread(target=post, args=("a", 0.25))
            t2 = threading.Thread(target=post, args=("b", 0.75))
            t1.start(); t2.start(); t1.join(); t2.join()
            assert len(fp.calls) == 1, "requests were not coalesced"
            np.testing.assert_allclose(results["a"], 0.25, rtol=1e-6)
            np.testing.assert_allclose(results["b"], 0.75, rtol=1e-6)
        finally:
            sched.close()

    def test_bad_shapes_rejected(self):
        fp, sched = make(batch_size=2)
        try:
            with pytest.raises(ValueError):
                sched.submit(np.zeros((N_VOX + 1,), np.float32))
            with pytest.raises(ValueError):
                sched.submit(np.zeros((3, N_VOX), np.float32))  # > batch
        finally:
            sched.close()

    def test_pipeline_error_propagates(self):
        def boom(voxels, seed):
            raise RuntimeError("device on fire")

        sched = BatchingScheduler(boom, N_VOX, ServerConfig())
        try:
            with pytest.raises(RuntimeError, match="device on fire"):
                sched.submit(np.zeros((N_VOX,), np.float32), timeout=10)
        finally:
            sched.close()

    def test_stats(self):
        fp, sched = make()
        try:
            sched.submit(np.zeros((N_VOX,), np.float32), timeout=10)
            s = sched.stats()
            assert s["served_clips"] == 1 and s["batches"] == 1
            assert s["latency_ms_p50"] is not None
        finally:
            sched.close()


@pytest.fixture()
def server():
    fp = FakePipeline()
    srv = InferenceServer(fp, N_VOX, ServerConfig(port=0, batch_size=2))
    srv.start()
    yield srv
    srv.close()


def _post(srv, arr, path="/reconstruct"):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    conn.request("POST", path, body=buf.getvalue())
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp, body


class TestHTTP:
    def test_healthz_and_stats(self, server):
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=10)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"
        assert health["n_voxels"] == N_VOX
        conn.request("GET", "/stats")
        assert "served_clips" in json.loads(conn.getresponse().read())
        conn.close()

    def test_reconstruct_npy_roundtrip(self, server):
        resp, body = _post(server, np.full((N_VOX,), 0.5, np.float32))
        assert resp.status == 200
        video = np.load(io.BytesIO(body))
        assert video.shape == (1, F, 3, H, W)
        np.testing.assert_allclose(video, 0.5, rtol=1e-6)

    def test_reconstruct_gif(self, server):
        resp, body = _post(server, np.full((N_VOX,), 0.5, np.float32),
                           path="/reconstruct?format=gif")
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "image/gif"
        assert body[:4] == b"GIF8"

    def test_bad_request_is_400(self, server):
        resp, body = _post(server, np.zeros((N_VOX + 3,), np.float32))
        assert resp.status == 400
        assert "expected voxels" in json.loads(body)["error"]

    def test_unknown_path_404(self, server):
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=10)
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
        conn.close()
