"""Multi-slice (DCN) topology on the 8-virtual-CPU mesh: a 2-D
("slice", "data") mesh where the batch shards over every axis, the
PartialFC class shard lives on the inner (ICI) data axis replicated
across slices, and the only cross-slice traffic is the per-step gradient
reduction (core/mesh.py, train/train_step.py). The reference has no
multi-node story at all (single-host NCCL rendezvous, train.py:54)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

from msml_tpu.core.mesh import (batch_axes, batch_sharding, class_sharding,
                                local_batch_size, make_mesh, mesh_world)
from msml_tpu.heads.margin import l2_normalize
from msml_tpu.heads.partial_fc import PartialFC

SLICES, DATA = 2, 4
NUM_CLASSES = 61          # not divisible by 4: padding path
DIM = 16
BATCH = 24                # 3 rows per device over 8 devices


def _mesh2():
    return make_mesh(jax.devices()[:SLICES * DATA], num_slices=SLICES)


def _num_local():
    return -(-NUM_CLASSES // DATA)


def _data(seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(BATCH, DIM).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES, size=(BATCH,)).astype(np.int32)
    w = (0.01 * rng.randn(DATA * _num_local(), DIM)).astype(np.float32)
    return feats, labels, w


def test_make_mesh_multislice_shape():
    mesh = _mesh2()
    assert mesh.axis_names == ("slice", "data")
    assert mesh.shape["slice"] == SLICES and mesh.shape["data"] == DATA
    assert mesh_world(mesh) == SLICES * DATA
    assert batch_axes(mesh) == ("slice", "data")
    assert batch_sharding(mesh).spec == P(("slice", "data"))
    assert class_sharding(mesh).spec == P("data")
    assert local_batch_size(BATCH, mesh) == BATCH // (SLICES * DATA)
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:6], num_slices=4)
    # auto-detect: CPU devices expose no slice topology -> 1-D mesh
    auto = make_mesh(jax.devices()[:8], num_slices=0)
    assert auto.axis_names == ("data",)


def test_make_mesh_rejects_topology_mismatch():
    """--dcn-slices that disagrees with the hardware slice grouping must
    error loudly: a mesh row mixing hardware slices silently routes the
    'data'-axis (PFC) collectives over DCN."""
    class FakeDev:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

    # 4 hardware slices of 2 devices, asked for 2 mesh slices of 4:
    # row 0 would hold hardware slices {0, 1}
    devs = [FakeDev(i, i // 2) for i in range(8)]
    with pytest.raises(ValueError, match="does not match the hardware"):
        make_mesh(devs, num_slices=2)


def _dense_oracle(w, feats, labels, eps=0.1):
    """Full-batch dense smoothed CE with the owner-shard smoothing quirk,
    at DATA class shards (identical to test_partial_fc's oracle with
    WORLD=DATA): the multi-slice loss — mean over slices of equal-sized
    per-slice batch means — must equal this full-batch mean."""
    num_local = _num_local()
    c_pad = DATA * num_local
    f = l2_normalize(jnp.asarray(feats))
    wn = l2_normalize(jnp.asarray(w))
    logits = f @ wn.T
    col_valid = jnp.arange(c_pad) < NUM_CLASSES
    logits = jnp.where(col_valid[None, :], logits, -1e30)
    logp = jax.nn.log_softmax(logits, axis=-1)
    owner = labels // num_local
    col_shard = jnp.arange(c_pad) // num_local
    in_owner = (col_shard[None, :] == owner[:, None]) & col_valid[None, :]
    one_hot = jax.nn.one_hot(labels, c_pad)
    n_valid_owner = jnp.minimum(NUM_CLASSES - owner * num_local, num_local)
    off = eps / jnp.maximum(n_valid_owner - 1, 1)[:, None]
    t = (1 - eps) * one_hot + off * (in_owner & (one_hot == 0))
    return -(t * logp).sum(-1).mean()


@pytest.mark.slow
def test_pfc_multislice_loss_and_grads_match_dense():
    """Dense PFC on the 2x4 mesh (class shard on "data", replicated over
    "slice", per-slice CE pmean'd) == full-batch dense oracle; gradients
    wrt the replicated weight and the pod-sharded features too."""
    feats, labels, w = _data(0)
    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM,
                    slice_axis="slice")
    mesh = _mesh2()

    def sharded(w, feats):
        def f(w, feats, labels):
            loss, _ = pfc.loss(w, feats, labels)
            return lax.pmean(loss, "slice")
        fn = jax.shard_map(f, mesh=mesh,
                           in_specs=(P("data"), P(("slice", "data")),
                                     P(("slice", "data"))),
                           out_specs=P())
        return fn(w, feats, jnp.asarray(labels))

    loss = sharded(jnp.asarray(w), jnp.asarray(feats))
    want = _dense_oracle(w, feats, labels)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)

    g_w, g_f = jax.grad(sharded, argnums=(0, 1))(jnp.asarray(w),
                                                 jnp.asarray(feats))
    gw_want, gf_want = jax.grad(
        lambda w, f: _dense_oracle(w, f, labels), argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(gf_want),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(gw_want),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_pfc_multislice_sampling_slice_consistent():
    """Sampled PFC across slices: every slice replica of a class shard
    selects the IDENTICAL subset (required for the replicated weight to
    stay consistent), and every positive of the POD-wide batch is kept —
    including classes that only occur in the *other* slice's rows."""
    feats, _, w = _data(1)
    num_local = _num_local()
    # labels land in every shard; the first half of the batch (slice 0)
    # and second half (slice 1) use disjoint in-shard classes
    labels = np.array([(i % DATA) * num_local + (i % 2) + 2 * (i // 12)
                       for i in range(BATCH)], dtype=np.int32)
    labels = np.minimum(labels, NUM_CLASSES - 1).astype(np.int32)
    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM,
                    sample_rate=0.5, slice_axis="slice")
    mesh = _mesh2()
    rng = jax.random.PRNGKey(3)

    def f(w, feats, labels):
        loss, aux = pfc.loss(w, feats, labels, rng)
        index, remapped = pfc.presample(labels, rng)
        return lax.pmean(loss, "slice"), aux["sample_index"], index

    fn = jax.shard_map(f, mesh=mesh,
                       in_specs=(P("data"), P(("slice", "data")),
                                 P(("slice", "data"))),
                       out_specs=(P(), P(("slice", "data")),
                                  P(("slice", "data"))))
    loss, idx_loss, idx_pre = fn(jnp.asarray(w), jnp.asarray(feats),
                                 jnp.asarray(labels))
    assert np.isfinite(float(loss))
    for index in (idx_loss, idx_pre):
        index = np.asarray(index).reshape(SLICES, DATA, -1)
        assert index.shape[2] == pfc.num_sample(DATA)
        # slice replicas of each shard: identical subsets
        np.testing.assert_array_equal(index[0], index[1])
        # pod-wide positives all kept per shard
        for r in range(DATA):
            local = labels[(labels >= r * num_local)
                           & (labels < (r + 1) * num_local)] - r * num_local
            assert set(local.tolist()) <= set(index[0, r].tolist())
    # loss() and presample() agree on the subset
    np.testing.assert_array_equal(np.asarray(idx_loss), np.asarray(idx_pre))


@pytest.mark.slow
def test_train_step_multislice_equals_flat():
    """Full train step: the 2x4 multi-slice mesh must produce the same
    losses and updated params as the flat 1x8 mesh on the same global
    batch (plain head config — identical math, only the collective
    topology differs)."""
    from msml_tpu.core.config import Config, config_init, lr_step_factor
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train import optim
    from msml_tpu.train.train_step import init_train_state, make_train_step

    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": 2,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": False,
        "fm_layers": [0, 0, 0, 0], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "ms_test", "num_classes": 64,
        "out_folder": "/tmp/msml_test_out"})
    config_init(cfg)

    batch = synthetic_batch(16, size=cfg.out_size[0], channels=3,
                            num_classes=cfg.num_classes, seed=0)
    del batch["msk"], batch["ori"]
    rng = jax.random.PRNGKey(0)

    results = {}
    for name, mesh in (("flat", make_mesh(jax.devices()[:8])),
                       ("slices", _mesh2())):
        model = msml_from_config(cfg, policy=FULL_PRECISION)
        state = init_train_state(model, cfg, rng, mesh)
        lr_scales = optim.build_lr_scales(state.params, cfg,
                                          mesh_world(mesh))
        step = make_train_step(model, cfg, mesh, lr_scales, None)
        hist = []
        for i in range(2):
            state, metrics = step(state, dict(batch),
                                  lr_step_factor(cfg, 0), rng)
            hist.append({k: float(v) for k, v in metrics.items()})
        results[name] = (jax.device_get(state.params), hist)

    p_flat, h_flat = results["flat"]
    p_ms, h_ms = results["slices"]
    for a, b in zip(h_flat, h_ms):
        for k in a:
            # grad_norm is a full-tree f32 reduction; CPU reduction order
            # is thread-nondeterministic (observed up to ~0.2% rel on this
            # O(8e3) norm) — and the clip divides it back out, so params
            # stay tight below
            rtol = 1e-2 if k == "grad_norm" else 2e-4
            np.testing.assert_allclose(a[k], b[k], rtol=rtol, atol=1e-5,
                                       err_msg=k)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(p_flat)[0],
            jax.tree_util.tree_flatten_with_path(p_ms)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=str(pa))


@pytest.mark.slow
def test_train_step_multislice_sampled_pfc_consistency():
    """Sampled PartialFC through the full multi-slice train step: the
    class-sharded weight (replicated across slices, updated with the
    cross-slice-psum'd row grads) must hold bit-identical values on every
    slice replica after real update steps."""
    from msml_tpu.core.config import Config, config_init, lr_step_factor
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.heads.margin import get_margin_fn
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train import optim
    from msml_tpu.train.train_step import init_train_state, make_train_step

    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": 2,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": False,
        "fm_layers": [0, 0, 0, 0], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMCosFace", "header_params": [64.0, 0.4, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "ms_pfc", "num_classes": 64,
        "sample_rate": 0.5, "out_folder": "/tmp/msml_test_out"})
    config_init(cfg)

    mesh = _mesh2()
    model = msml_from_config(cfg, policy=FULL_PRECISION,
                             external_header=True)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, mesh, use_pfc=True)
    pfc = PartialFC(num_classes=cfg.num_classes,
                    embedding_size=cfg.dim_feature,
                    sample_rate=float(cfg.sample_rate),
                    margin_fn=get_margin_fn(cfg.header_type,
                                            cfg.header_params))
    lr_scales = optim.build_lr_scales(state.params, cfg, mesh_world(mesh))
    step = make_train_step(model, cfg, mesh, lr_scales, pfc)

    for i in range(2):
        batch = synthetic_batch(16, size=cfg.out_size[0], channels=3,
                                num_classes=cfg.num_classes, seed=i)
        del batch["msk"], batch["ori"]
        state, metrics = step(state, batch, lr_step_factor(cfg, 0), rng)
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics

    # group per-device buffers of the weight by shard index: slice
    # replicas must agree exactly
    for arr in (state.pfc_weight, state.pfc_momentum):
        by_index = {}
        for shard in arr.addressable_shards:
            by_index.setdefault(str(shard.index), []).append(
                np.asarray(shard.data))
        assert any(len(v) > 1 for v in by_index.values())
        for copies in by_index.values():
            for c in copies[1:]:
                np.testing.assert_array_equal(copies[0], c)
    # the weight actually moved (updates applied)
    w0 = init_train_state(model, cfg, rng, mesh, use_pfc=True).pfc_weight
    assert float(jnp.abs(state.pfc_weight - w0).max()) > 0.0
