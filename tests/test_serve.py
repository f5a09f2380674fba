"""msml-serve: dynamic batching, shape buckets, and the HTTP API.

Fast cases exercise the Batcher/ModelRunner/HTTP layers against a
deterministic fake forward; the slow case serves a real exported
StableHLO artifact end-to-end and matches the live model.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from msml_tpu.cli.serve import (Batcher, ModelRunner, _buckets,
                                build_server)


def _post(url, data, timeout=60):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


class _FakeRaw:
    """Deterministic linear 'model': feature = per-channel spatial mean."""

    def __init__(self):
        self.batch_sizes = []

    def __call__(self, x):
        self.batch_sizes.append(int(x.shape[0]))
        return np.asarray(x, np.float32).mean(axis=(1, 2))


def _runner(**kw):
    kw.setdefault("flip", False)
    kw.setdefault("l2_norm", False)
    return ModelRunner(_FakeRaw(), out_size=(16, 16), is_gray=False,
                       use_norm=True, meta={"network": "fake"}, **kw)


def test_bucket_ladder():
    assert _buckets(32) == [1, 2, 4, 8, 16, 32]
    assert _buckets(24) == [1, 2, 4, 8, 16, 24]
    assert _buckets(1) == [1]


def test_batcher_pads_to_buckets_and_slices_back():
    raw = _FakeRaw()
    b = Batcher(raw, max_batch=8, window_ms=1.0)
    xs = np.random.RandomState(0).rand(3, 16, 16, 3).astype(np.float32)
    y = b.run_padded(xs)
    assert y.shape == (3, 3)
    np.testing.assert_allclose(y, xs.mean(axis=(1, 2)), rtol=1e-6)
    assert raw.batch_sizes[-1] == 4  # padded 3 -> bucket 4

    # oversized input is chunked at max_batch
    xs = np.random.RandomState(1).rand(19, 16, 16, 3).astype(np.float32)
    y = b.run_padded(xs)
    assert y.shape == (19, 3)
    np.testing.assert_allclose(y, xs.mean(axis=(1, 2)), rtol=1e-6)
    assert raw.batch_sizes[-3:] == [8, 8, 4]  # 8 + 8 + pad(3 -> 4)


def test_batcher_gathers_concurrent_submits():
    raw = _FakeRaw()
    b = Batcher(raw, max_batch=16, window_ms=50.0)
    xs = np.random.RandomState(2).rand(6, 4, 4, 3).astype(np.float32)
    outs = [None] * 6

    def work(i):
        outs[i] = b.submit(xs[i])

    ts = [threading.Thread(target=work, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for i in range(6):
        np.testing.assert_allclose(outs[i], xs[i].mean(axis=(0, 1)),
                                   rtol=1e-6)
    # the 50 ms window must have merged requests: fewer device calls
    # than requests, every one at a power-of-two bucket size
    assert len(raw.batch_sizes) < 6
    assert all(s in (1, 2, 4, 8, 16) for s in raw.batch_sizes)


def test_batcher_propagates_inference_errors():
    def boom(x):
        raise RuntimeError("device on fire")

    b = Batcher(boom, max_batch=4, window_ms=1.0)
    with pytest.raises(RuntimeError, match="device on fire"):
        b.submit(np.zeros((4, 4, 3), np.float32))
    # the loop must survive the failure and serve later requests
    b._infer = lambda x: x.mean(axis=(1, 2))
    y = b.submit(np.ones((4, 4, 3), np.float32))
    np.testing.assert_allclose(y, [1.0, 1.0, 1.0], rtol=1e-6)


def test_http_api_end_to_end():
    from PIL import Image

    runner = _runner()
    httpd, _ = build_server(runner, port=0, max_batch=8, window_ms=1.0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        code, health = _get(base + "/healthz")
        assert code == 200 and health["status"] == "ok"
        assert health["input_hwc"] == [16, 16, 3]
        assert health["network"] == "fake"

        # /embed: raw image bytes, server-side preprocessing
        img = Image.fromarray(
            np.random.RandomState(3).randint(0, 255, (16, 16, 3),
                                             np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        code, out = _post(base + "/embed", buf.getvalue())
        assert code == 200
        want = runner.preprocess_image(buf.getvalue()).mean(axis=(0, 1))
        np.testing.assert_allclose(out["embedding"], want, rtol=1e-5)

        # /embed_batch: preprocessed .npy tensor
        xs = np.random.RandomState(4).rand(5, 16, 16, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, xs)
        code, out = _post(base + "/embed_batch", buf.getvalue())
        assert code == 200
        np.testing.assert_allclose(np.asarray(out["embeddings"]),
                                   xs.mean(axis=(1, 2)), rtol=1e-5)

        # malformed input -> 400 with an explanation, server stays up
        bad = io.BytesIO()
        np.save(bad, np.zeros((2, 8, 8, 3), np.float32))
        try:
            code, out = _post(base + "/embed_batch", bad.getvalue())
        except urllib.error.HTTPError as e:
            code, out = e.code, json.loads(e.read())
        assert code == 400 and "expected" in out["error"]
        code, _ = _get(base + "/healthz")
        assert code == 200
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_flip_sum_and_l2_policy():
    runner = _runner(flip=True, l2_norm=True)
    xs = np.random.RandomState(5).rand(2, 16, 16, 3).astype(np.float32)
    y = runner.infer(xs)
    raw = xs.mean(axis=(1, 2)) + xs[:, :, ::-1, :].mean(axis=(1, 2))
    want = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    np.testing.assert_allclose(y, want, rtol=1e-5)


@pytest.mark.slow
def test_serve_stablehlo_artifact_end_to_end(tmp_path):
    """Export a real (tiny) MSML to StableHLO, serve it from the artifact
    alone, and match the live model through the HTTP API."""
    import jax
    import jax.numpy as jnp

    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.nn.msml import MSML
    from msml_tpu.tools.export_serving import export_eval_fn

    model = MSML(frb_type="iresnet18", num_classes=16, use_osb=False,
                 fm_layers=(0, 0, 0, 0), header_type="AMArcFace",
                 header_params=(64.0, 0.48, 0, 0),
                 fm_params=(3, 2, "sigmoid", "mul"),
                 policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    blob = export_eval_fn(model, params, stats, (112, 112, 3))
    path = str(tmp_path / "model.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump({"input_hwc": [112, 112, 3], "use_norm": True,
                   "network": "iresnet18", "dim": 512}, f)

    from msml_tpu.cli.serve import runner_from_artifact
    runner = runner_from_artifact(path, flip=False, l2_norm=False)
    httpd, _ = build_server(runner, port=0, max_batch=4, window_ms=1.0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        xs = np.random.RandomState(6).rand(3, 112, 112, 3).astype(
            np.float32)
        buf = io.BytesIO()
        np.save(buf, xs)
        code, out = _post(f"http://127.0.0.1:{port}/embed_batch",
                          buf.getvalue(), timeout=600)
        assert code == 200
        want, _ = model.apply({"params": params, "batch_stats": stats},
                              jnp.asarray(xs), train=False)
        np.testing.assert_allclose(np.asarray(out["embeddings"]),
                                   np.asarray(want), atol=5e-5, rtol=1e-4)
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_quant_flag_rejected_for_artifacts():
    from msml_tpu.cli import serve

    args = serve.parse_args(["--artifact", "m.stablehlo", "--quant", "int8",
                             "--no-warmup"])
    with pytest.raises(SystemExit):
        serve.main(args)


def test_metrics_endpoint_and_load_bench():
    """GET /metrics Prometheus counters + the bench_serve load generator
    against a live (fake-model) server."""
    runner = _runner()
    httpd, batcher = build_server(runner, port=0, max_batch=8,
                                  window_ms=1.0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"

        xs = np.random.RandomState(1).rand(3, 16, 16, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, xs)
        for _ in range(2):
            code, _ = _post(base + "/embed_batch", buf.getvalue())
            assert code == 200
        # a malformed request must count as an error
        try:
            _post(base + "/embed_batch", b"junk")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
            assert r.status == 200
            assert "text/plain" in r.headers["Content-Type"]
            text = r.read().decode()
        m = {}
        for line in text.splitlines():
            if line and not line.startswith("#"):
                k, v = line.rsplit(" ", 1)
                m[k] = float(v)
        assert m["msml_requests_total"] == 3
        assert m["msml_request_errors_total"] == 1
        assert m["msml_device_batches_total"] == 2
        assert m["msml_images_total"] == 6
        assert m["msml_request_latency_seconds_count"] == 3
        # histogram is cumulative: +Inf bucket == count
        assert m['msml_request_latency_seconds_bucket{le="+Inf"}'] == 3

        # load generator: short burst, both request styles
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
        from bench_serve import run_load
        rep = run_load(base, concurrency=4, batch=4, duration=1.0)
        assert rep["requests"] > 0 and rep["errors"] == 0
        assert rep["images_per_sec"] >= rep["rps"] * 4 * 0.5
        assert rep["p50_ms"] <= rep["p99_ms"]
        rep1 = run_load(base, concurrency=4, batch=1, duration=1.0,
                        single=True)
        assert rep1["requests"] > 0 and rep1["errors"] == 0

        # the load shows up in the metrics
        with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
            text = r.read().decode()
        total = [float(x.rsplit(" ", 1)[1]) for x in text.splitlines()
                 if x.startswith("msml_requests_total")][0]
        assert total >= 3 + rep["requests"] + rep1["requests"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_shard_eval_pad_and_drop():
    """shard_eval pads any host batch to the mesh multiple, shards, and
    drops the padding rows (the serving-side mesh discipline)."""
    import jax
    import jax.numpy as jnp

    from msml_tpu.core.mesh import make_mesh
    from msml_tpu.train.train_step import shard_eval

    mesh = make_mesh()
    n = mesh.devices.size
    seen = []

    @jax.jit
    def fn(x):
        seen.append(x.shape[0])
        return jnp.sum(x, axis=(1, 2, 3), keepdims=False)[:, None] * jnp.ones((1, 4))

    bound = shard_eval(fn, mesh)
    x = np.arange(3 * 2 * 2 * 3, dtype=np.float32).reshape(3, 2, 2, 3)
    y = np.asarray(bound(x))
    assert y.shape == (3, 4)
    np.testing.assert_allclose(y[:, 0], x.sum(axis=(1, 2, 3)), rtol=1e-6)
    assert seen[0] % n == 0 and seen[0] >= 3  # padded to a mesh multiple


def test_spatial_flag_rejected_for_artifacts():
    from msml_tpu.cli import serve

    args = serve.parse_args(["--artifact", "m.stablehlo", "--spatial", "2",
                             "--no-warmup"])
    with pytest.raises(SystemExit):
        serve.main(args)


def test_spatial_plus_quant_rejected():
    from msml_tpu.cli.serve import runner_from_weight_folder

    with pytest.raises(SystemExit):
        runner_from_weight_folder("/nonexistent", quant="int8", spatial=2)
