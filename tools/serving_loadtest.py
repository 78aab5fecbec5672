"""Load test of the serving subsystem on the REAL compiled TPU pipeline
— saturated, bursty, and trickle load shapes (VERDICT r3 weak #4).

tests/test_serving.py exercises the HTTP surface and the batching
scheduler against a fake pipeline; this drives the actual chained
stage-3+5 graph (serving.build_bench_pipeline -> bench.build) and
measures what the scheduler was built for, under THREE arrival shapes:

  saturated — N clients firing back-to-back: do queued singles coalesce
              into full device batches? (steady throughput bound)
  bursty    — clients fire short bursts separated by idle gaps: partial
              batches + coalescing under irregular arrivals
  trickle   — one sparse client: every batch is partial; exercises the
              max_wait timeout dispatch path end-to-end on the chip

Each shape gets a FRESH InferenceServer over the same compiled pipeline,
so scheduler stats are per-shape. `--batch 2,4` builds each compiled
batch size in turn (all shapes on the first, saturated on the rest —
a second full build is minutes over the tunnel). The per-build
`build_compile_s` row is the startup story: run once cold and once
warm and the persistent compile cache difference is the number the
`serve` command documents.

Run ON THE TPU from /root/repo:
    python tools/serving_loadtest.py --batch 2,4
Writes SERVING_r05.json. BENCH_TINY=1 + --platform cpu smoke-tests the
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


def one_request(url, vox, lat_out, err_out):
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


def client(url, n_vox, n_requests, seed, lat_out, err_out, gaps=None):
    """gaps: optional per-request sleep-before-send seconds."""
    rng = np.random.default_rng(seed)
    for i in range(n_requests):
        if gaps is not None:
            time.sleep(gaps[i])
        vox = (rng.standard_normal(n_vox, dtype=np.float32) * 0.5)
        one_request(url, vox, lat_out, err_out)


# shape -> (clients, requests/client, gap builder(stat latency est))
def shape_plans(est_s):
    rng = np.random.default_rng(0)
    return {
        "saturated": (4, 3, lambda ci: None),
        # 2 bursts of 2: both clients of a pair arrive together, then
        # everyone idles ~1.5 batch-times so the queue fully drains and
        # the next arrivals start a fresh (initially partial) batch
        "bursty": (4, 4, lambda ci: [0.0, 0.0, 1.5 * est_s, 0.0]
                   if ci % 2 == 0 else [0.1, 0.0, 1.5 * est_s + 0.1, 0.0]),
        # sparse single client: every batch dispatches on max_wait
        # timeout at occupancy 1/batch
        "trickle": (1, 4, lambda ci: list(rng.uniform(
            0.3 * est_s, 0.8 * est_s, size=4))),
    }


def run_shape(serving, pipeline, n_vox, batch, max_wait_ms, shape, plan):
    clients_n, reqs, gap_fn = plan
    cfg = serving.ServerConfig(host="127.0.0.1", port=0, batch_size=batch,
                               max_wait_ms=max_wait_ms)
    srv = serving.InferenceServer(pipeline, n_vox, cfg)
    srv.start()
    url = f"http://127.0.0.1:{srv.port}"
    print(f"[{shape}] serving on {url} (batch {batch}); "
          f"{clients_n} clients x {reqs} requests", flush=True)
    lats, errs = [], []
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client,
                                args=(url, n_vox, reqs, 100 + i, lats,
                                      errs, gap_fn(i)))
               for i in range(clients_n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = srv.scheduler.stats()
    srv.close()
    lats.sort()
    n = len(lats)
    return {
        "clients": clients_n, "requests_per_client": reqs,
        "completed": n, "errors": errs,
        "wall_s": round(wall, 2),
        "clips_per_s": round(n / wall, 3) if wall else None,
        "client_latency_s_p50": round(lats[n // 2], 2) if n else None,
        "client_latency_s_p95": round(lats[min(n - 1, int(0.95 * n))], 2)
        if n else None,
        "scheduler_stats": stats,
    }, n == clients_n * reqs and not errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=str, default="2",
                    help="comma list of compiled batch sizes, e.g. 2,4 "
                         "(all shapes on the first, saturated on the rest)")
    ap.add_argument("--shapes", type=str,
                    default="saturated,bursty,trickle")
    ap.add_argument("--max_wait_ms", type=int, default=2000,
                    help="scheduler coalescing window; generous so "
                         "concurrent singles actually batch")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--out", type=str,
                    default=os.path.join(_REPO, "SERVING_r05.json"))
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from neurons_tpu import serving

    batches = [int(b) for b in args.batch.split(",")]
    shapes = args.shapes.split(",")
    doc = {"max_wait_ms": args.max_wait_ms, "runs": []}
    ok = True
    for bi, batch in enumerate(batches):
        t0 = time.perf_counter()
        print(f"building + compiling the real batch-{batch} pipeline "
              "(cold: minutes over the tunnel) ...", flush=True)
        try:
            pipeline, n_vox = serving.build_bench_pipeline(batch)
        except Exception as e:
            # a batch size that does not fit the chip is a MEASURED
            # capacity limit, not a harness crash: record it and keep
            # the completed runs (the first r5 attempt lost the whole
            # batch-2 result set to a batch-4 RESOURCE_EXHAUSTED here)
            print(f"!!! batch-{batch} pipeline build failed: "
                  f"{type(e).__name__}: {e}", flush=True)
            doc["runs"].append({
                "batch_size": batch,
                "build_error": f"{type(e).__name__}: {str(e)[:300]}",
                "build_failed_after_s": round(time.perf_counter() - t0, 1),
                "note": "full-size chained stage-3+5 pipeline at this "
                        "batch exceeds the single v5e's 16 GB HBM "
                        "(consistent with the measured batch-4 f32 "
                        "stage-3 21.3 GB; batching also does not help "
                        "throughput — batch 2 measured 9.6 s/clip vs "
                        "5.7 at batch 1, PERF.md)"})
            continue
        build_s = time.perf_counter() - t0
        # per-clip latency estimate drives the bursty/trickle gap sizing
        est = max(build_s / 50.0, 1.0)
        run = {"batch_size": batch,
               "build_compile_s": round(build_s, 1), "shapes": {}}
        for shape in (shapes if bi == 0 else ["saturated"]):
            res, shape_ok = run_shape(serving, pipeline, n_vox, batch,
                                      args.max_wait_ms, shape,
                                      shape_plans(est)[shape])
            run["shapes"][shape] = res
            ok = ok and shape_ok
            # refine the gap estimate from the measured p50
            if res["client_latency_s_p50"]:
                est = res["client_latency_s_p50"]
        doc["runs"].append(run)

    import jax
    doc["platform"] = jax.devices()[0].platform
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))
    print(f"-> {args.out}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
