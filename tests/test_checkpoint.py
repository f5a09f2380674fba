"""Orbax checkpoint save/restore: exact-state roundtrip on the 8-device
mesh, including the class-sharded PartialFC weight and the retention
policy (core/checkpoint.py)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model init + orbax IO per test

from msml_tpu.core import checkpoint as ckpt
from msml_tpu.core.config import Config, config_init
from msml_tpu.core.mesh import make_mesh
from msml_tpu.core.precision import FULL_PRECISION
from msml_tpu.nn.msml import msml_from_config
from msml_tpu.train.train_step import TrainState, init_train_state


def _cfg():
    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": 2,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": False,
        "fm_layers": [0, 0, 0, 0], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "ckpt_test", "num_classes": 64,
        "sample_rate": 0.5, "out_folder": "/tmp/msml_test_out"})
    config_init(cfg)
    return cfg


def _tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip_with_pfc_shard(tmp_path):
    cfg = _cfg()
    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION,
                             external_header=True)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, mesh, use_pfc=True)
    # make the state distinguishable from a fresh init
    state = state.replace(
        step=state.step + 7,
        momentum=jax.tree.map(lambda m: m + 0.5, state.momentum),
        pfc_momentum=state.pfc_momentum + 1.25)

    out = str(tmp_path / "wf")
    ckpt.save_checkpoint(out, state, step=7)

    template = init_train_state(model, cfg, jax.random.PRNGKey(1), mesh,
                                use_pfc=True)
    restored = ckpt.restore_checkpoint(out, template)
    assert restored is not None
    assert int(restored.step) == 7
    _tree_equal(restored.params, state.params)
    _tree_equal(restored.momentum, state.momentum)
    np.testing.assert_array_equal(np.asarray(restored.pfc_weight),
                                  np.asarray(state.pfc_weight))
    np.testing.assert_array_equal(np.asarray(restored.pfc_momentum),
                                  np.asarray(state.pfc_momentum))
    # shardings follow the template: pfc weight stays class-sharded
    assert restored.pfc_weight.sharding.spec == \
        jax.sharding.PartitionSpec("data")
    assert ckpt.latest_step(out) == 7


def test_checkpoint_retention_keeps_three(tmp_path):
    cfg = _cfg()
    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION,
                             external_header=True)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh,
                             use_pfc=True)
    out = str(tmp_path / "wf")
    for s in (1, 2, 3, 4, 5):
        ckpt.save_checkpoint(out, state.replace(step=state.step * 0 + s), s)
    assert ckpt.latest_step(out) == 5
    # max_to_keep=3: step 1 and 2 gone
    assert ckpt.restore_checkpoint(
        out, state, step=5) is not None
    import os
    kept = sorted(int(d) for d in os.listdir(os.path.join(out, "ckpt"))
                  if d.isdigit())
    assert kept == [3, 4, 5], kept


def test_restore_missing_returns_none(tmp_path):
    cfg = _cfg()
    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION,
                             external_header=True)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh,
                             use_pfc=True)
    assert ckpt.restore_checkpoint(str(tmp_path / "nope"), state) is None


def test_save_same_step_twice_is_noop(tmp_path):
    """A --ckpt-every save landing on the same step as the epoch-end save
    must not raise orbax StepAlreadyExistsError (cli/train.py saves both)."""
    import jax.numpy as jnp

    from msml_tpu.core.checkpoint import (latest_step, restore_checkpoint,
                                          save_checkpoint)
    state = {"w": jnp.arange(4.0)}
    save_checkpoint(str(tmp_path), state, 7)
    save_checkpoint(str(tmp_path), state, 7)   # no-op, no crash
    assert latest_step(str(tmp_path)) == 7
    out = restore_checkpoint(str(tmp_path), {"w": jnp.zeros(4)})
    assert float(out["w"][3]) == 3.0


def test_async_checkpoint_writer_roundtrip(tmp_path):
    """CheckpointWriter (async orbax saves overlapping training, the
    cli.train path): save -> mutate live state -> save again -> close;
    both steps durable, restore returns each exactly; same-step re-save
    is a no-op (returns False)."""
    cfg = _cfg()
    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION,
                             external_header=True)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh,
                             use_pfc=True)
    out = str(tmp_path / "wf")

    w = ckpt.CheckpointWriter(out, async_save=True)
    s1 = state.replace(step=state.step + 1,
                       pfc_momentum=state.pfc_momentum + 1.0)
    assert w.save(s1, 1) is True
    # the async snapshot must be decoupled from later mutations of the
    # "live" training state
    s2 = s1.replace(step=s1.step + 1,
                    pfc_momentum=s1.pfc_momentum + 2.0)
    assert w.save(s2, 2) is True
    w.wait()
    assert w.save(s2, 2) is False  # dedup, like save_checkpoint
    w.close()

    template = init_train_state(model, cfg, jax.random.PRNGKey(1), mesh,
                                use_pfc=True)
    r1 = ckpt.restore_checkpoint(out, template, step=1)
    r2 = ckpt.restore_checkpoint(out, template, step=2)
    assert int(r1.step) == 1 and int(r2.step) == 2
    np.testing.assert_allclose(np.asarray(r2.pfc_momentum),
                               np.asarray(r1.pfc_momentum) + 2.0)
    _tree_equal(r2.params, s2.params)


def test_checkpoint_reshards_between_fsdp_and_replicated(tmp_path):
    """Elastic resume across state layouts: an FSDP-sharded checkpoint
    restores into a replicated template and vice versa (orbax restores
    into the TEMPLATE's shardings — the mesh/layout at save time does not
    pin the resume layout)."""
    from msml_tpu.core.fsdp import init_fsdp_train_state, sharded_fraction

    cfg = _cfg()
    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    fs_state = init_fsdp_train_state(model, cfg, jax.random.PRNGKey(0),
                                     mesh)
    assert sharded_fraction(fs_state.params) > 0.9
    out = str(tmp_path / "wf")
    ckpt.save_checkpoint(out, fs_state, step=1)

    # FSDP checkpoint -> replicated template (e.g. resume single-chip)
    repl = jax.tree.map(
        lambda x: jax.device_put(np.zeros(x.shape, x.dtype)), fs_state)
    r = ckpt.restore_checkpoint(out, repl, step=1)
    _tree_equal(r.params, fs_state.params)
    _tree_equal(r.momentum, fs_state.momentum)

    # replicated checkpoint -> FSDP template (scale-out resume): values
    # equal AND the restored leaves actually carry the FSDP sharding
    out2 = str(tmp_path / "wf2")
    ckpt.save_checkpoint(out2, r, step=1)
    template = init_fsdp_train_state(model, cfg, jax.random.PRNGKey(7),
                                     mesh)
    r2 = ckpt.restore_checkpoint(out2, template, step=1)
    _tree_equal(r2.params, fs_state.params)
    k = r2.params["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    assert not k.sharding.is_fully_replicated
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 8
