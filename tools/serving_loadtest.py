"""Concurrent-client load test of the serving subsystem on the REAL
compiled TPU pipeline.

tests/test_serving.py exercises the HTTP surface and the batching
scheduler against a fake pipeline; this drives the actual chained
stage-3+5 graph (serving.build_bench_pipeline -> bench.build) with N
concurrent HTTP clients at a compiled batch size of 2-4, measuring what
the scheduler was built for: batch occupancy under concurrency (do
queued singles coalesce into full device batches?), client-observed
p50/p95 latency, and sustained clips/s.

Run ON THE TPU from /root/repo (one process holds the tunnel; the
clients are threads in this process):
    python tools/serving_loadtest.py --batch 2 --clients 4 --requests 3
Writes SERVING_r03.json. BENCH_TINY=1 + --platform cpu smoke-tests the
harness itself.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def client(url, n_vox, n_requests, seed, lat_out, err_out):
    rng = np.random.default_rng(seed)
    for i in range(n_requests):
        vox = (rng.standard_normal(n_vox, dtype=np.float32) * 0.5)
        buf = io.BytesIO()
        np.save(buf, vox)
        req = urllib.request.Request(
            url + "/reconstruct", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                video = np.load(io.BytesIO(r.read()), allow_pickle=False)
            assert np.isfinite(video).all()
            lat_out.append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — record, don't kill thread
            err_out.append(f"{type(e).__name__}: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=3,
                    help="requests per client (1 clip each)")
    ap.add_argument("--max_wait_ms", type=int, default=2000,
                    help="scheduler coalescing window; generous so "
                         "concurrent singles actually batch")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--out", type=str,
                    default=os.path.join(_REPO, "SERVING_r03.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from neurons_tpu import serving

    t0 = time.perf_counter()
    print("building + compiling the real pipeline (cold: minutes over "
          "the tunnel) ...", flush=True)
    pipeline, n_vox = serving.build_bench_pipeline(args.batch)
    build_s = time.perf_counter() - t0
    cfg = serving.ServerConfig(host="127.0.0.1", port=0,
                               batch_size=args.batch,
                               max_wait_ms=args.max_wait_ms)
    srv = serving.InferenceServer(pipeline, n_vox, cfg)
    srv.start()
    url = f"http://127.0.0.1:{srv.port}"
    print(f"serving on {url} (batch {args.batch}); "
          f"{args.clients} clients x {args.requests} requests", flush=True)

    lats, errs = [], []
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client,
                                args=(url, n_vox, args.requests, 100 + i,
                                      lats, errs))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = srv.scheduler.stats()
    srv.close()

    lats.sort()
    n = len(lats)
    doc = {
        "batch_size": args.batch,
        "clients": args.clients,
        "requests_per_client": args.requests,
        "completed": n,
        "errors": errs,
        "build_compile_s": round(build_s, 1),
        "wall_s": round(wall, 2),
        "clips_per_s": round(n / wall, 3) if wall else None,
        "client_latency_s_p50": round(lats[n // 2], 2) if n else None,
        "client_latency_s_p95": round(lats[min(n - 1, int(0.95 * n))], 2)
        if n else None,
        "scheduler_stats": stats,
    }
    import jax
    doc["platform"] = jax.devices()[0].platform
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))
    print(f"-> {args.out}")
    if errs or n != args.clients * args.requests:
        sys.exit(1)


if __name__ == "__main__":
    main()
