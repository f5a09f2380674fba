"""Spatial partitioning (core/spatial.py): GSPMD eval forward with the
image height sharded over a ("data", "spatial") mesh must match the plain
data-parallel eval step — XLA inserts the conv halo exchanges.

The reference's eval parallelism is batch-only (nn.DataParallel,
eval/qeval_mxnet.py:162); spatial partitioning is the TPU-native latency
lever for batch-1 serving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msml_tpu.core.mesh import make_mesh
from msml_tpu.core.precision import FULL_PRECISION
from msml_tpu.core.spatial import (SPATIAL_AXIS, make_spatial_eval_step,
                                   make_spatial_mesh)
from msml_tpu.nn.msml import msml_from_config
from msml_tpu.train.train_step import make_eval_step
from tests.test_train_step import _cfg


@pytest.fixture(scope="module")
def model_and_ref():
    cfg = _cfg()
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 112, 112, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x0,
                   jnp.zeros((2,), jnp.int32), train=True)
    params, bs = v["params"], v["batch_stats"]
    img = np.random.RandomState(0).randn(6, 112, 112, 3).astype(np.float32)
    ref = np.asarray(make_eval_step(model, make_mesh())(params, bs, img))
    return model, params, bs, img, ref


@pytest.mark.slow
@pytest.mark.parametrize("n_spatial", [2, 8])
def test_spatial_eval_matches_plain(model_and_ref, n_spatial):
    """(data, spatial) = (4,2) and (1,8); batch 6 also exercises the
    pad-and-drop path on the data axis."""
    model, params, bs, img, ref = model_and_ref
    mesh = make_spatial_mesh(n_spatial)
    assert mesh.axis_names == ("data", SPATIAL_AXIS)
    out = np.asarray(make_spatial_eval_step(model, mesh)(params, bs, img))
    assert out.shape == ref.shape
    # f32 reduction-order noise from the partitioned convs only
    np.testing.assert_allclose(out, ref, atol=2e-3)
    cos = (out * ref).sum(-1) / (np.linalg.norm(out, axis=-1)
                                 * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.9999999


def test_spatial_mesh_validation():
    with pytest.raises(ValueError):
        make_spatial_mesh(3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_spatial_eval_step(object(), make_mesh())  # no spatial axis
