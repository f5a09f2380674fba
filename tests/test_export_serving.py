"""Serialized-StableHLO serving export (tools/export_serving.py):
round-trips through jax.export.deserialize and runs at symbolic batch
sizes, matching the live model's outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msml_tpu.core.precision import FULL_PRECISION
from msml_tpu.nn.msml import MSML
from msml_tpu.tools.export_serving import export_eval_fn


@pytest.mark.slow
def test_export_serving_roundtrip():
    from jax import export

    model = MSML(frb_type="iresnet18", num_classes=16, use_osb=False,
                 fm_layers=(0, 0, 0, 0), header_type="AMArcFace",
                 header_params=(64.0, 0.48, 0, 0),
                 fm_params=(3, 2, "sigmoid", "mul"), policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    blob = export_eval_fn(model, params, stats, (112, 112, 3))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = export.deserialize(bytes(blob))
    for b in (2, 5):  # symbolic batch dim
        img = np.random.RandomState(b).randn(b, 112, 112, 3).astype(
            np.float32)
        got = np.asarray(fn.call(img))
        assert got.shape == (b, 512)
        want, _ = model.apply({"params": params, "batch_stats": stats},
                              jnp.asarray(img), train=False)
        np.testing.assert_allclose(got, np.asarray(want), atol=5e-5,
                                   rtol=1e-4)


@pytest.mark.slow
def test_export_serving_int8_quant_roundtrip():
    """--quant int8 export: smaller artifact (weights fold to int8
    consts), symbolic batch still works, embeddings stay close to fp."""
    from jax import export

    model = MSML(frb_type="iresnet18", num_classes=16, use_osb=False,
                 fm_layers=(0, 0, 0, 0), header_type="AMArcFace",
                 header_params=(64.0, 0.48, 0, 0),
                 fm_params=(3, 2, "sigmoid", "mul"), policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    blob_fp = export_eval_fn(model, params, stats, (112, 112, 3))
    blob_q = export_eval_fn(model, params, stats, (112, 112, 3),
                            quant="int8")
    # int8 constants: the artifact shrinks (not exactly 4x: BN/PReLU
    # params and per-channel scales stay f32)
    assert len(blob_q) < 0.45 * len(blob_fp), (len(blob_q), len(blob_fp))

    fn = export.deserialize(bytes(blob_q))
    img = np.random.RandomState(7).randn(3, 112, 112, 3).astype(np.float32)
    got = np.asarray(fn.call(img), np.float64)
    assert got.shape == (3, 512)
    want, _ = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(img), train=False)
    want = np.asarray(want, np.float64)
    cos = np.sum(got * want, axis=1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.998, cos
