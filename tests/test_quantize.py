"""int8 PTQ jaxpr transform (`core/quantize.quantize_fn`).

Fast cases exercise the transform mechanics (skip rules, per-sample
scales, recursion, jit/export composition) on a small standalone CNN;
the slow case checks end-to-end accuracy on the real MSML eval forward.
The reference has no quantization capability (beyond-parity feature).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from msml_tpu.core.quantize import quantize_fn


class _SmallCNN(nn.Module):
    """stem (C_in=3, contraction 27 < 64: must be kept) -> 3x3 conv at
    C=64 (contraction 576: quantized) -> dense head (quantized)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(32, use_bias=False)(x)


@pytest.fixture(scope="module")
def small_model():
    model = _SmallCNN()
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(img):
        return model.apply(variables, img)

    return fwd


def _rand(b=4, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(b, 16, 16, 3), jnp.float32)


@pytest.mark.slow
def test_skip_rules_and_stats(small_model):
    stats = {}
    qf = quantize_fn(small_model, stats_out=stats)
    qf(_rand())
    # stem conv kh*kw*C_in = 27 < 64 stays fp; the C=64 conv and the
    # dense head are quantized
    assert stats == {"conv_quantized": 1, "conv_kept": 1,
                     "dot_quantized": 1, "dot_kept": 0}


@pytest.mark.slow
def test_accuracy_close_to_fp(small_model):
    x = _rand(8, seed=1)
    ref = np.asarray(small_model(x), np.float64)
    out = np.asarray(quantize_fn(small_model)(x), np.float64)
    cos = np.sum(ref * out, axis=1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(out, axis=1))
    assert cos.min() > 0.999, cos


def test_batch_invariance_per_sample_scales(small_model):
    """A request's output must not depend on its batch-mates: the serving
    batcher re-batches dynamically (cli/serve.py), and activation scales
    are per-sample precisely to keep answers bit-stable under that."""
    qf = jax.jit(quantize_fn(small_model))
    x = _rand(4, seed=2)
    big = np.asarray(qf(jnp.concatenate(
        [x, 100.0 * jnp.ones((4, 16, 16, 3), jnp.float32)])))
    alone = np.asarray(qf(jnp.concatenate(
        [x, jnp.zeros((4, 16, 16, 3), jnp.float32)])))
    np.testing.assert_array_equal(big[:4], alone[:4])


@pytest.mark.slow
def test_zero_input_finite(small_model):
    """All-zero rows (the batcher's padding) must not produce inf/nan
    through the dynamic-scale division."""
    y = np.asarray(quantize_fn(small_model)(
        jnp.zeros((2, 16, 16, 3), jnp.float32)))
    assert np.isfinite(y).all()


def test_recurses_into_remat(small_model):
    stats = {}
    qf = quantize_fn(jax.checkpoint(small_model), stats_out=stats)
    qf(_rand())
    assert stats["conv_quantized"] == 1 and stats["dot_quantized"] == 1


def test_quantize_dot_toggle(small_model):
    stats = {}
    quantize_fn(small_model, quantize_dot=False, stats_out=stats)(_rand())
    assert "dot_quantized" not in stats or stats["dot_quantized"] == 0
    assert stats["conv_quantized"] == 1


def test_min_contract_gate(small_model):
    stats = {}
    quantize_fn(small_model, min_contract=1024, stats_out=stats)(_rand())
    assert stats == {"conv_quantized": 0, "conv_kept": 2,
                     "dot_quantized": 0, "dot_kept": 1}


def test_bf16_graph_quantizes_and_returns_bf16():
    def fwd(x, w):
        return jax.lax.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))

    x = _rand(2, seed=3).reshape(2, -1)
    w = jnp.asarray(np.random.RandomState(4).randn(x.shape[1], 8),
                    jnp.float32)
    stats = {}
    y = quantize_fn(fwd, stats_out=stats)(x, w)
    assert stats["dot_quantized"] == 1
    assert y.dtype == jnp.bfloat16


def test_integer_dot_stays_untouched():
    def fwd(x, w):
        return jax.lax.dot(x, w)  # s32 output: not a float op

    x = jnp.ones((4, 128), jnp.int32)
    w = jnp.ones((128, 8), jnp.int32)
    stats = {}
    y = quantize_fn(fwd, stats_out=stats)(x, w)
    assert stats == {"conv_quantized": 0, "conv_kept": 0,
                     "dot_quantized": 0, "dot_kept": 1}
    np.testing.assert_array_equal(np.asarray(y), 128)


def test_composes_with_export(small_model, tmp_path):
    """jax.export of the quantized forward: weights fold to int8 consts."""
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((4, 16, 16, 3), jnp.float32)
    exported = jexport.export(jax.jit(quantize_fn(small_model)))(spec)
    blob = exported.serialize()
    fn = jexport.deserialize(blob)
    x = _rand(4, seed=5)
    np.testing.assert_allclose(np.asarray(fn.call(x)),
                               np.asarray(quantize_fn(small_model)(x)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_msml_eval_forward_accuracy():
    """End-to-end on the real flagship graph: >= 0.998 embedding cosine,
    ~94% of convs quantized (only the stem/tiny-contraction ones kept)."""
    from msml_tpu.core.config import Config, config_init
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.nn.msml import msml_from_config

    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": 4,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "q", "num_classes": 256,
        "out_folder": "/tmp/msml_q_out"})
    config_init(cfg)
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((4, 112, 112, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x0,
                   jnp.zeros((4,), jnp.int32), train=True)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}

    def fwd(img):
        feature, _ = model.apply(v, img, train=False)
        return feature

    stats = {}
    qfwd = jax.jit(quantize_fn(fwd, stats_out=stats))
    x = jnp.asarray(np.random.RandomState(0).randn(4, 112, 112, 3) * 0.5,
                    jnp.float32)
    ref = np.asarray(fwd(x), np.float64)
    out = np.asarray(qfwd(x), np.float64)
    cos = np.sum(ref * out, axis=1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(out, axis=1))
    assert cos.min() > 0.998, (cos, stats)
    assert stats["conv_quantized"] > 80
    assert stats["conv_kept"] <= 8
