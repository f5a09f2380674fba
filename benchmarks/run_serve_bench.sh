#!/bin/bash
# Warmed serving benchmark runbook (PERF.md r5 "Serving numbers"):
# start msml-serve, drive every batcher bucket to steady state (the
# per-bucket first-request compiles must land BEFORE the timed windows),
# then measure p50/p99 + img/s under three load shapes.
set -e
cd "$(dirname "$0")/.."
WF=${1:-/tmp/msml_conv/out/conv_hard_6}
PORT=${2:-8124}
python -u -m msml_tpu.cli.serve --weight_folder "$WF" --port $PORT &
SRV=$!
trap "kill $SRV 2>/dev/null" EXIT
for i in $(seq 1 180); do
  curl -s -m 5 http://127.0.0.1:$PORT/healthz >/dev/null 2>&1 && break
  sleep 5
done
python - <<PYEOF
import io, urllib.request, numpy as np, time
def post(arr):
    buf = io.BytesIO(); np.save(buf, arr)
    req = urllib.request.Request("http://127.0.0.1:$PORT/embed_batch",
        data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=1200) as r: r.read()
    return time.time() - t0
for b in (1, 16, 32):
    for i in range(6):
        print(f"warm b={b}: {post(np.random.rand(b,112,112,3).astype('float32'))*1e3:.0f} ms", flush=True)
PYEOF
python -u benchmarks/bench_serve.py --url http://127.0.0.1:$PORT --concurrency 8 --batch 16 --duration 45
python -u benchmarks/bench_serve.py --url http://127.0.0.1:$PORT --concurrency 32 --batch 1 --single --duration 45
python -u benchmarks/bench_serve.py --url http://127.0.0.1:$PORT --concurrency 8 --batch 32 --duration 45
