"""HTTP load test for a running `msml-serve` instance.

Drives POST /embed_batch (or /embed with --single, exercising the dynamic
batcher) from N concurrent connections for a fixed duration and reports
throughput + latency percentiles — the serving numbers that matter for
capacity planning. Needs only numpy (plus msml_tpu's image encoder in
--single mode); the HTTP side is standard library.

Usage:
  msml-serve --weight_folder out/arc18_msml_1 --port 8000 &
  python benchmarks/bench_serve.py --url http://127.0.0.1:8000 \
      --concurrency 8 --batch 16 --duration 30 [--single]

Prints one JSON line:
  {"requests": R, "errors": E, "images_per_sec": I, "rps": Q,
   "p50_ms": ..., "p95_ms": ..., "p99_ms": ...}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _healthz(url: str) -> dict:
    with urllib.request.urlopen(url + "/healthz", timeout=120) as r:
        return json.loads(r.read())


def _worker(url: str, payload: bytes, path: str, deadline: float,
            lat: list, errs: list):
    while time.monotonic() < deadline:
        t0 = time.monotonic()
        try:
            req = urllib.request.Request(url + path, data=payload,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                r.read()
            lat.append(time.monotonic() - t0)
        except Exception:  # noqa: BLE001 - counted, not raised
            errs.append(1)


def run_load(url: str, concurrency: int, batch: int, duration: float,
             single: bool = False, seed: int = 0) -> dict:
    h, w, c = _healthz(url)["input_hwc"]
    rng = np.random.RandomState(seed)
    if single:
        # one image per request through the dynamic batcher; send a real
        # encoded image so server-side preprocessing is measured too
        from msml_tpu.data.recordio import imencode
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        payload, path, imgs_per_req = imencode(img), "/embed", 1
    else:
        xs = rng.randn(batch, h, w, c).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, xs)
        payload, path, imgs_per_req = buf.getvalue(), "/embed_batch", batch

    # warm the executable (first request may compile)
    _worker(url, payload, path, time.monotonic() + 0.001, [], [])

    lats = [[] for _ in range(concurrency)]
    errs = [[] for _ in range(concurrency)]
    deadline = time.monotonic() + duration
    threads = [threading.Thread(target=_worker,
                                args=(url, payload, path, deadline,
                                      lats[i], errs[i]))
               for i in range(concurrency)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0

    lat = np.sort(np.concatenate([np.asarray(x) for x in lats])
                  if any(lats) else np.zeros(0))
    n_err = sum(len(e) for e in errs)
    if lat.size == 0:
        raise SystemExit(f"no successful requests ({n_err} errors)")

    def pct(p):
        # nearest-rank percentile: ceil(p/100 * n) - 1 (0-based)
        idx = max(0, -(-int(p * lat.size) // 100) - 1)
        return round(float(lat[min(lat.size - 1, idx)]) * 1e3, 2)

    return {"requests": int(lat.size), "errors": int(n_err),
            "images_per_sec": round(lat.size * imgs_per_req / dt, 2),
            "rps": round(lat.size / dt, 2),
            "p50_ms": pct(50), "p95_ms": pct(95), "p99_ms": pct(99)}


def main(argv=None):
    p = argparse.ArgumentParser(description="msml-serve load test")
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--batch", type=int, default=16,
                   help="images per /embed_batch request")
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--single", action="store_true",
                   help="one JPEG per request via /embed (exercises the "
                        "dynamic batcher + server-side preprocessing)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    print(json.dumps(run_load(args.url, args.concurrency, args.batch,
                              args.duration, single=args.single,
                              seed=args.seed)))


if __name__ == "__main__":
    main()
