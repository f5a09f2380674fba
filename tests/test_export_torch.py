"""Reverse interop: export our MSML params to the reference backbone.pth
format (tools/export_torch.py) and prove it round-trips through
import_msml_checkpoint AND loads strict into the torch oracle architecture
with forward parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msml_tpu.core.precision import FULL_PRECISION  # noqa: E402
from msml_tpu.nn.msml import MSML  # noqa: E402
from msml_tpu.tools.export_torch import export_msml_state_dict  # noqa: E402
from msml_tpu.tools.import_torch import (import_msml_checkpoint,  # noqa: E402
                                         merge_into)


def _init_model():
    model = MSML(frb_type="iresnet18", num_classes=16, use_osb=True,
                 header_type="AMArcFace", header_params=(64.0, 0.48, 0, 0),
                 fm_params=(3, 2, "sigmoid", "mul"), policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(3)
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x,
                           jnp.zeros((1,), jnp.int32), train=True)
    return model, variables


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], path + "/" + k)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=path)


@pytest.mark.slow
def test_export_import_roundtrip():
    model, variables = _init_model()
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sd = export_msml_state_dict(params, stats)
    params_in, stats_in = import_msml_checkpoint(sd)
    # everything the exporter wrote must come back identically; the header
    # is external to the exported backbone (classification head not in our
    # flax tree), so compare the re-imported subset against the originals
    got_p = merge_into(params, params_in)
    got_s = merge_into(stats, stats_in)
    _tree_equal(got_p, params)
    _tree_equal(got_s, stats)
    # and the import actually covered the full backbone (non-trivial)
    assert "frb" in params_in and "osb" in params_in
    assert "fm_op0" in params_in and "res0" in params_in["fm_op0"]


@pytest.mark.slow
def test_export_loads_strict_into_torch_oracle():
    """The exported dict must satisfy torch load_state_dict(strict=True) on
    the reference-architecture oracle and produce the same eval forward."""
    from tests.test_import_msml import TMSML

    model, variables = _init_model()
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sd = export_msml_state_dict(params, stats)

    tmodel = TMSML()
    # the oracle has no classification head (the real reference MSML does;
    # qeval loads backbone.pth into the full model)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)).copy())
           for k, v in sd.items() if not k.startswith("classification.")}
    missing, unexpected = [], []
    try:
        tmodel.load_state_dict(tsd)  # strict
    except RuntimeError as e:  # surface the exact key mismatches
        raise AssertionError(f"strict load failed: {e}")
    tmodel.eval()

    x = np.random.RandomState(0).randn(2, 112, 112, 3).astype(np.float32)
    feat, seg = model.apply({"params": variables["params"],
                             "batch_stats": variables["batch_stats"]},
                            jnp.asarray(x), train=False)
    with torch.no_grad():
        tfeat, tseg = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got, want = np.asarray(feat), tfeat.numpy()
    cos = (got * want).sum(1) / (np.linalg.norm(got, axis=1)
                                 * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos


@pytest.mark.slow
def test_export_import_roundtrip_lightcnn():
    """LightCNN flavor: export -> import identity on the full tree."""
    model = MSML(frb_type="lightcnn", num_classes=16, use_osb=True,
                 header_type="Softmax", header_params=(64.0, 0.5, 0, 0),
                 fm_params=(3, 2, "tanh", "add"), policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(5)
    x = jnp.zeros((1, 128, 128, 1), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sd = export_msml_state_dict(params, stats)
    assert "frb.conv1.filter.weight" in sd and "frb.group4.conv.filter.bias" in sd
    params_in, stats_in = import_msml_checkpoint(sd)
    got_p = merge_into(params, params_in)
    _tree_equal(got_p, params)
    # fc row-permutation must round-trip exactly (8x8x128 flatten)
    np.testing.assert_allclose(
        np.asarray(got_p["frb"]["fc"]["kernel"]),
        np.asarray(params["frb"]["fc"]["kernel"]), atol=1e-6)


@pytest.mark.slow
def test_export_import_roundtrip_peer():
    """Peer-teacher branch of the exporter (frb.peer.*) round-trips."""
    model = MSML(frb_type="iresnet18", num_classes=16, use_osb=True,
                 header_type="AMArcFace", header_params=(64.0, 0.48, 0, 0),
                 fm_params=(3, 2, "sigmoid", "mul"),
                 use_ori=True, use_conv=True, mask_trans="conv",
                 policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(9)
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x,
                           jnp.zeros((1,), jnp.int32), x, train=True)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sd = export_msml_state_dict(params, stats)
    assert "frb.peer.conv1.weight" in sd
    assert "frb.fm_ops.0.conv_m.0.weight" in sd      # peer towers exported
    assert "frb.fm_ops.0.conv2.3.weight" in sd
    params_in, _ = import_msml_checkpoint(sd)
    got_p = merge_into(params, params_in)
    _tree_equal(got_p, params)
