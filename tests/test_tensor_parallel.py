"""Tensor (model) parallelism (core/tensor_parallel.py): Megatron
column/row specs on the iResNet blocks, class-sharded dense head, GSPMD
eval equality, and mesh-shape invariance of the TP train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from msml_tpu.core.tensor_parallel import (MODEL_AXIS, init_tp_train_state,
                                           make_tp_eval_step, make_tp_mesh,
                                           make_tp_train_step,
                                           shard_params_tp, tp_specs)


def _tiny_cfg(num_classes=64, batch_size=2):
    from msml_tpu.core.config import Config, config_init
    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": batch_size,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "tp_test", "num_classes": num_classes,
        "out_folder": "/tmp/msml_tp_test_out",
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
    """Abstract init (shapes only): the spec rules never look at values,
    so the fast tier skips the real-parameter materialization."""
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


def test_tp_specs_rules(tiny_msml_shapes):
    _, _, variables = tiny_msml_shapes
    specs = tp_specs(variables["params"], 4)
    blk = specs["frb"]["layer1"]["block0"]
    assert blk["conv1"]["kernel"] == P(None, None, None, MODEL_AXIS)
    assert blk["conv2"]["kernel"] == P(None, None, MODEL_AXIS, None)
    assert blk["bn2"]["scale"] == P(MODEL_AXIS)
    assert blk["prelu"]["alpha"] == P(MODEL_AXIS)
    assert blk["bn1"]["scale"] == P()
    assert blk["downsample_conv"]["kernel"] == P()
    # stem + fc replicated (IResNet top level is not a block: no bn3)
    assert specs["frb"]["conv1"]["kernel"] == P()
    assert specs["frb"]["fc"]["kernel"] == P()
    # dense head class-sharded (the tensor PartialFC shards on the
    # shard_map path)
    assert specs["classification"]["weight"] == P(MODEL_AXIS, None)
    # batch_stats tree: only the intra-block bn2 stats shard
    sspecs = tp_specs(variables["batch_stats"], 4)
    sblk = sspecs["frb"]["layer1"]["block0"]
    assert sblk["bn2"]["mean"] == P(MODEL_AXIS)
    assert sblk["bn1"]["mean"] == P()
    assert sblk["bn3"]["var"] == P()


def test_tp_specs_indivisible_replicates(tiny_msml_shapes):
    """Widths that do not divide the model axis leave the whole block
    replicated (all five pieces must agree)."""
    _, _, variables = tiny_msml_shapes
    specs = tp_specs(variables["params"], 7)
    blk = specs["frb"]["layer1"]["block0"]  # 64 % 7 != 0
    assert blk["conv1"]["kernel"] == P()
    assert blk["bn2"]["scale"] == P()
    # n_model == 1: everything replicated
    specs1 = tp_specs(variables["params"], 1)
    assert all(s == P() for s in jax.tree.leaves(
        specs1, is_leaf=lambda x: isinstance(x, P)))


@pytest.mark.slow
def test_tp_eval_matches_plain(tiny_msml):
    _, model, variables = tiny_msml
    rng = np.random.RandomState(0)
    img = rng.randn(6, 112, 112, 3).astype(np.float32)
    ref, _ = model.apply({"params": variables["params"],
                          "batch_stats": variables["batch_stats"]},
                         jnp.asarray(img), train=False)
    for shape in ((4, 2), (2, 4)):
        mesh = make_tp_mesh(shape[1])
        step = make_tp_eval_step(model, variables["params"],
                                 variables["batch_stats"], mesh)
        out = np.asarray(step(img))  # batch 6 pads to 8 over data=4 or 2
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4,
                                   atol=2e-4,
                                   err_msg=f"mesh {shape}")


@pytest.mark.slow
def test_tp_params_actually_sharded(tiny_msml):
    _, _, variables = tiny_msml
    mesh = make_tp_mesh(4)
    params = shard_params_tp(variables["params"], mesh)
    k = params["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    assert k.shape[-1] == 512
    assert k.addressable_shards[0].data.shape[-1] == 512 // 4
    w = shard_params_tp(variables["params"], mesh)["classification"]["weight"]
    assert w.addressable_shards[0].data.shape[0] == w.shape[0] // 4


@pytest.mark.slow
def test_tp_train_step_mesh_invariance(tiny_msml):
    """The GSPMD TP step computes the same update on any mesh shape
    (global-batch semantics): (data=8, model=1) == (data=4, model=2) ==
    (data=2, model=4), two steps."""
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.train import optim

    cfg, model, _ = tiny_msml
    rng = jax.random.PRNGKey(1)
    batches = []
    for s in range(2):
        b = synthetic_batch(8, size=112, num_classes=cfg.num_classes,
                            seed=100 + s)
        b.pop("ori", None)
        batches.append(b)

    results = {}
    for n_model in (1, 2, 4):
        mesh = make_tp_mesh(n_model)
        state = init_tp_train_state(model, cfg, rng, mesh)
        lr_scales = optim.build_lr_scales(state.params, cfg, 8)
        step = make_tp_train_step(model, cfg, mesh, lr_scales)
        ms = []
        for b in batches:
            state, metrics = step(state, b, 1.0, rng)
            ms.append({k: float(v) for k, v in metrics.items()})
        results[n_model] = (jax.device_get(state.params), ms)
        assert np.isfinite(ms[-1]["total_loss"]), ms

    p_ref, m_ref = results[1]
    for n_model in (2, 4):
        p, m = results[n_model]
        for s in range(2):
            for k in m_ref[s]:
                np.testing.assert_allclose(
                    m[s][k], m_ref[s][k], rtol=5e-4, atol=5e-5,
                    err_msg=f"model={n_model} step={s} metric {k}")
        flat_ref = jax.tree_util.tree_leaves_with_path(p_ref)
        flat = dict(jax.tree_util.tree_leaves_with_path(p))
        for path, leaf in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat[path]), np.asarray(leaf), rtol=1e-3,
                atol=1e-5, err_msg=f"model={n_model} {jax.tree_util.keystr(path)}")


@pytest.mark.slow
def test_tp_step_preserves_shardings(tiny_msml):
    """The jit contract pins the TP layout: params keep their column/row
    shardings across steps (no silent resharding)."""
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.train import optim

    cfg, model, _ = tiny_msml
    mesh = make_tp_mesh(4)
    rng = jax.random.PRNGKey(2)
    state = init_tp_train_state(model, cfg, rng, mesh)
    spec_before = state.params["frb"]["layer4"]["block0"]["conv1"][
        "kernel"].sharding.spec
    lr_scales = optim.build_lr_scales(state.params, cfg, 8)
    step = make_tp_train_step(model, cfg, mesh, lr_scales)
    b = synthetic_batch(8, size=112, num_classes=cfg.num_classes, seed=3)
    b.pop("ori", None)
    state, _ = step(state, b, 1.0, rng)
    k = state.params["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    assert k.sharding.spec == spec_before
    assert k.addressable_shards[0].data.shape[-1] == 512 // 4


def test_tp_mesh_validation():
    with pytest.raises(ValueError):
        make_tp_mesh(3)  # 8 % 3
    with pytest.raises(ValueError):
        make_tp_mesh(0)
    from msml_tpu.core.mesh import make_mesh
    with pytest.raises(ValueError):
        make_tp_eval_step(None, {}, {}, make_mesh())  # no model axis
