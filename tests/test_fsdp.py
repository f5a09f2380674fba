"""FSDP/ZeRO parameter+optimizer sharding (core/fsdp.py): spec rules,
real shard placement, equality with the replicated GSPMD step, and layout
preservation across steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from msml_tpu.core.fsdp import (fsdp_specs, init_fsdp_train_state,
                                make_fsdp_train_step, shard_params_fsdp,
                                sharded_fraction)
from msml_tpu.core.mesh import make_mesh


def _tiny_cfg(num_classes=64, batch_size=2):
    from msml_tpu.core.config import Config, config_init
    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": batch_size,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "fsdp_test",
        "num_classes": num_classes, "out_folder": "/tmp/msml_fsdp_test_out",
    })
    config_init(cfg)
    return cfg


def _build_model():
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.nn.msml import msml_from_config
    cfg = _tiny_cfg()
    return cfg, msml_from_config(cfg, policy=FULL_PRECISION)


@pytest.fixture(scope="module")
def tiny_msml_shapes():
    """Abstract init (shapes only) — the spec rules never look at values."""
    cfg, model = _build_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda r: model.init({"params": r, "dropout": r}, x,
                             jnp.zeros((2,), jnp.int32), train=True), rng)
    return cfg, model, variables


@pytest.fixture(scope="module")
def tiny_msml():
    cfg, model = _build_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x,
                           jnp.zeros((2,), jnp.int32), train=True)
    return cfg, model, variables


def test_fsdp_spec_rules(tiny_msml_shapes):
    _, _, variables = tiny_msml_shapes
    specs = fsdp_specs(variables["params"], 8)
    # big conv kernel: largest divisible dim (output channels) sharded
    blk = specs["frb"]["layer4"]["block0"]
    assert blk["conv1"]["kernel"] == P(None, None, None, "data")
    # 1-D BN leaves: replicated (min-size gate)
    assert blk["bn2"]["scale"] == P()
    # the (num_classes=64, 512) head weight: largest dim (512) sharded;
    # at real class counts (93k) the classes dim wins instead
    assert specs["classification"]["weight"] == P(None, "data")
    assert fsdp_specs(
        {"w": jax.ShapeDtypeStruct((93432, 512), jnp.float32)},
        8)["w"] == P("data", None)
    # stem conv (3,3,3,64) = 1728 elements < 4096: replicated
    assert specs["frb"]["conv1"]["kernel"] == P()
    # fc on the flattened 7x7x512: largest dim sharded
    fc = variables["params"]["frb"]["fc"]["kernel"]
    d = int(np.argmax(fc.shape))
    want = [None, None]
    want[d] = "data"
    assert specs["frb"]["fc"]["kernel"] == P(*want)
    # n_shard == 1: everything replicated
    specs1 = fsdp_specs(variables["params"], 1)
    assert all(s == P() for s in jax.tree.leaves(
        specs1, is_leaf=lambda x: isinstance(x, P)))


def test_fsdp_indivisible_replicates():
    leaves = {"w": jax.ShapeDtypeStruct((7, 13, 11), jnp.float32),
              "v": jax.ShapeDtypeStruct((100, 100), jnp.float32)}
    specs = fsdp_specs(leaves, 8)
    assert specs["w"] == P()   # big enough, nothing divides 8
    assert specs["v"] == P()   # 100 % 8 != 0
    # both dims divide 4 and tie at 100; the >= rule picks the LAST dim
    specs4 = fsdp_specs(leaves, 4)
    assert specs4["v"] == P(None, "data")


@pytest.mark.slow
def test_fsdp_params_actually_sharded(tiny_msml):
    _, _, variables = tiny_msml
    mesh = make_mesh()
    params = shard_params_fsdp(variables["params"], mesh)
    k = params["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 8
    # most parameter bytes actually live sharded
    assert sharded_fraction(params) > 0.9
    # BN leaves replicated
    s = params["frb"]["layer4"]["block0"]["bn2"]["scale"]
    assert s.sharding.is_fully_replicated


@pytest.mark.slow
def test_fsdp_step_matches_replicated(tiny_msml):
    """FSDP state layout computes the same two steps as the replicated
    GSPMD step (same global-batch step_fn, different shardings)."""
    from msml_tpu.core.tensor_parallel import (init_tp_train_state,
                                               make_tp_mesh,
                                               make_tp_train_step)
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.train import optim

    cfg, model, _ = tiny_msml
    rng = jax.random.PRNGKey(1)
    batches = []
    for s in range(2):
        b = synthetic_batch(8, size=112, num_classes=cfg.num_classes,
                            seed=200 + s)
        b.pop("ori", None)
        batches.append(b)

    # reference: replicated weights on the same 8-device mesh
    mesh_r = make_tp_mesh(1)
    state_r = init_tp_train_state(model, cfg, rng, mesh_r)
    lr_scales = optim.build_lr_scales(state_r.params, cfg, 8)
    step_r = make_tp_train_step(model, cfg, mesh_r, lr_scales)

    mesh = make_mesh()
    state = init_fsdp_train_state(model, cfg, rng, mesh)
    step = make_fsdp_train_step(model, cfg, mesh, lr_scales)

    for s, b in enumerate(batches):
        state_r, m_r = step_r(state_r, b, 1.0, rng)
        state, m = step(state, b, 1.0, rng)
        for k in m_r:
            np.testing.assert_allclose(
                float(m[k]), float(m_r[k]), rtol=5e-4, atol=5e-5,
                err_msg=f"step {s} metric {k}")

    flat_ref = jax.tree_util.tree_leaves_with_path(
        jax.device_get(state_r.params))
    flat = dict(jax.tree_util.tree_leaves_with_path(
        jax.device_get(state.params)))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat[path]), np.asarray(leaf), rtol=1e-3,
            atol=1e-5, err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_fsdp_step_preserves_shardings(tiny_msml):
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.train import optim

    cfg, model, _ = tiny_msml
    mesh = make_mesh()
    rng = jax.random.PRNGKey(2)
    state = init_fsdp_train_state(model, cfg, rng, mesh)
    k0 = state.params["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    spec_before = k0.sharding.spec
    assert not k0.sharding.is_fully_replicated
    lr_scales = optim.build_lr_scales(state.params, cfg, 8)
    step = make_fsdp_train_step(model, cfg, mesh, lr_scales)
    b = synthetic_batch(8, size=112, num_classes=cfg.num_classes, seed=5)
    b.pop("ori", None)
    state, metrics = step(state, b, 1.0, rng)
    k = state.params["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    assert k.sharding.spec == spec_before
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 8
    assert np.isfinite(float(metrics["total_loss"]))
    # momentum stays sharded too (the ZeRO point)
    mom = state.momentum["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    assert not mom.sharding.is_fully_replicated
