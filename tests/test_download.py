"""data/download.py exercised against a LOCAL mock of the HF hub API.

The real hub is unreachable (zero egress), which left the download path
as the one never-run component. huggingface_hub honors HF_ENDPOINT, so
a ThreadingHTTPServer implementing the slice snapshot_download uses —
`/api/{models,datasets}/{repo}/revision/{rev}` repo-info JSON plus
HEAD/GET `.../resolve/{rev}/{file}` with the ETag/commit headers — lets
the tests drive the actual code end-to-end: repo routing (dataset vs
model type), allow_patterns filtering, and on-disk layout.
"""

import json
import os
import threading

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

COMMIT = "0" * 40

# repo -> {path: content}; layouts mirror the real repos the reference
# pulls (download_dataset.py / animatediff auto_download)
REPOS = {
    ("datasets", "gongzx/cc2017_dataset"): {
        "GT_test_3fps.pt": b"tensor-dump-bytes",
        "subj1_test_fmri.pt": b"fmri-bytes",
    },
    ("models", "McGregorW/NEURONS"): {
        "masks/test_mask.pt": b"mask-bytes",
        "qwen_annotation/ann.json": b"{}",
        "EXP/huge_log.bin": b"x" * 64,  # must be filtered OUT by patterns
    },
    ("models", "guoyww/animatediff"): {
        "v3_sd15_mm.ckpt": b"mm",
        "v3_sd15_adapter.ckpt": b"adapter",
        "v3_sd15_sparsectrl_rgb.ckpt": b"sparse",
        "v2_unwanted.ckpt": b"nope",
    },
}


class _HubHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _route(self):
        # /api/{type}/{org}/{name}[/revision/{rev}]  or
        # /{org}/{name}/resolve/{rev}/{path} (models)  or
        # /datasets/{org}/{name}/resolve/{rev}/{path}
        p = self.path.split("?")[0]
        if p.startswith("/api/"):
            parts = p[5:].split("/")
            rtype, org, name = parts[0], parts[1], parts[2]
            return ("info", (rtype, f"{org}/{name}"), None)
        if p.startswith("/datasets/"):
            rest = p[len("/datasets/"):]
            rtype = "datasets"
        else:
            rest = p[1:]
            rtype = "models"
        org, name, _resolve, _rev, *fp = rest.split("/")
        return ("file", (rtype, f"{org}/{name}"), "/".join(fp))

    def _send_info(self, key):
        files = REPOS[key]
        body = json.dumps({
            "id": key[1], "sha": COMMIT, "private": False,
            "siblings": [{"rfilename": f} for f in sorted(files)],
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_file(self, key, path, head):
        data = REPOS[key].get(path)
        if data is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("ETag", f'"{hash(path) & 0xffffffff:08x}"')
        self.send_header("X-Repo-Commit", COMMIT)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Content-Type", "application/octet-stream")
        self.end_headers()
        if not head:
            self.wfile.write(data)

    def do_GET(self):
        kind, key, path = self._route()
        if kind == "info":
            self._send_info(key)
        else:
            self._send_file(key, path, head=False)

    def do_HEAD(self):
        kind, key, path = self._route()
        if kind == "info":
            self._send_info(key)
        else:
            self._send_file(key, path, head=True)


@pytest.fixture(scope="module")
def hub_server():
    """ONE server/port for the whole module: huggingface_hub submodules
    (file_download etc.) bind constants.ENDPOINT at their first import,
    so a per-test port would leave later tests pointing at a dead
    server."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _HubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_port
    srv.shutdown()


def _reload_hub():
    import importlib
    import sys
    import huggingface_hub.constants as C
    importlib.reload(C)
    for name in sorted(m for m in sys.modules
                       if m.startswith("huggingface_hub")
                       and not m.endswith(".constants")):
        try:
            importlib.reload(sys.modules[name])
        except Exception:
            pass


@pytest.fixture()
def mock_hub(hub_server, tmp_path, monkeypatch):
    monkeypatch.setenv("HF_ENDPOINT", f"http://127.0.0.1:{hub_server}")
    monkeypatch.setenv("HF_HUB_ETAG_TIMEOUT", "5")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf_home"))
    monkeypatch.setenv("HF_HUB_DISABLE_TELEMETRY", "1")
    _reload_hub()
    yield
    # env restored by monkeypatch; re-bind the real constants
    monkeypatch.undo()
    _reload_hub()


class TestDownload:
    def test_dataset_and_filtered_masks(self, mock_hub, tmp_path):
        from neurons_tpu.data.download import download
        root = str(tmp_path / "cc2017")
        download(root_dir=root)
        assert open(os.path.join(root, "GT_test_3fps.pt"), "rb").read() \
            == b"tensor-dump-bytes"
        assert os.path.exists(os.path.join(root, "subj1_test_fmri.pt"))
        # model repo with allow_patterns: masks/annotations in, EXP out
        assert os.path.exists(os.path.join(root, "masks/test_mask.pt"))
        assert os.path.exists(
            os.path.join(root, "qwen_annotation/ann.json"))
        assert not os.path.exists(os.path.join(root, "EXP/huge_log.bin"))

    def test_weights_bundle(self, mock_hub, tmp_path):
        from neurons_tpu.data.download import download_weights
        wdir = str(tmp_path / "weights")
        download_weights(weights_dir=wdir, bundles=("animatediff",))
        for f in ("v3_sd15_mm.ckpt", "v3_sd15_adapter.ckpt",
                  "v3_sd15_sparsectrl_rgb.ckpt"):
            assert os.path.exists(os.path.join(wdir, f)), f
        assert not os.path.exists(os.path.join(wdir, "v2_unwanted.ckpt"))
