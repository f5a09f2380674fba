"""device_light mode: uint8 host batches + in-step relight/normalize.

Host side: FaceByRandOccMask(raw_uint8=True) stops after the uint8 stages
(decode + occlusion + resize + flip). Device side:
kernels/augment.device_input_stage runs /255 + Gaussian relighting +
normalize inside the jitted train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msml_tpu.data.recordio import IRHeader, IndexedRecordIO, imencode, pack
from msml_tpu.kernels.augment import device_input_stage


@pytest.fixture(scope="module")
def rec_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dl_rec"))
    rng = np.random.RandomState(11)
    w = IndexedRecordIO(os.path.join(root, "train.idx"),
                        os.path.join(root, "train.rec"), "w")
    w.write_idx(0, pack(IRHeader(2, [33.0, 4.0], 1, 0), b""))
    for i in range(1, 33):
        img = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
        w.write_idx(i, pack(IRHeader(0, float(i % 4), 0, 0), imencode(img)))
    w.close()
    return root


def test_raw_uint8_matches_float_path(rec_root):
    """With relighting off, the float path must equal the uint8 path pushed
    through the same /255 + normalize math — same RNG stream up to the flip
    draw (the skipped stages draw only after it)."""
    from msml_tpu.data.face_dataset import FaceByRandOccMask

    kw = dict(occluder_root="/nonexistent", use_norm=True, use_ori=True,
              gauss_light=False, batch_size=8)
    a = FaceByRandOccMask(rec_root, raw_uint8=True, **kw)
    b = FaceByRandOccMask(rec_root, raw_uint8=False, **kw)
    for i in range(8):
        r1, r2 = np.random.RandomState(42 + i), np.random.RandomState(42 + i)
        img_u8, msk_u8, ori_u8, lab_u8 = a.__getitem__(i, r1)
        img_f, msk_f, ori_f, lab_f = b.__getitem__(i, r2)
        assert img_u8.dtype == np.uint8 and msk_u8.dtype == np.int32
        np.testing.assert_array_equal(
            (img_u8.astype(np.float32) / 255.0 - 0.5) / 0.5, img_f)
        np.testing.assert_array_equal(msk_u8, msk_f)
        np.testing.assert_array_equal(
            (ori_u8.astype(np.float32) / 255.0 - 0.5) / 0.5, ori_f)
        assert lab_u8 == lab_f


def test_raw_uint8_gray(rec_root):
    from msml_tpu.data.face_dataset import FaceByRandOccMask

    kw = dict(occluder_root="/nonexistent", use_norm=True, use_ori=False,
              gauss_light=False, batch_size=8, is_gray=True)
    a = FaceByRandOccMask(rec_root, raw_uint8=True, **kw)
    b = FaceByRandOccMask(rec_root, raw_uint8=False, **kw)
    r1, r2 = np.random.RandomState(3), np.random.RandomState(3)
    img_u8, _, _, _ = a.__getitem__(2, r1)
    img_f, _, _, _ = b.__getitem__(2, r2)
    assert img_u8.shape == (112, 112, 1)
    np.testing.assert_array_equal(
        (img_u8.astype(np.float32) / 255.0 - 0.5) / 0.5, img_f)


def test_device_input_stage_norm_only():
    """gauss_light=False: the stage is exactly the host float math."""
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (4, 16, 16, 3), np.uint8)
    out = device_input_stage(jnp.asarray(u8), jax.random.PRNGKey(0),
                             gauss_light=False, use_norm=True)
    ref = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-7)
    out2 = device_input_stage(jnp.asarray(u8), jax.random.PRNGKey(0),
                              gauss_light=False, use_norm=False)
    np.testing.assert_allclose(np.asarray(out2),
                               u8.astype(np.float32) / 255.0, atol=1e-7)


def test_device_input_stage_relight_properties():
    """Relighting mirrors _add_gauss_to_face: per-sample renorm to max 1
    before normalize; output therefore spans up to +1 after (x-.5)/.5 and
    differs across rng keys."""
    rng = np.random.RandomState(1)
    u8 = rng.randint(64, 256, (6, 32, 32, 3), np.uint8)
    out = np.asarray(device_input_stage(jnp.asarray(u8),
                                        jax.random.PRNGKey(1),
                                        gauss_light=True, use_norm=True))
    # un-normalize: light-scaled image renormed to per-sample max 1
    lin = out * 0.5 + 0.5
    np.testing.assert_allclose(lin.max(axis=(1, 2, 3)), 1.0, atol=1e-6)
    assert (lin >= -1e-6).all()
    out_b = np.asarray(device_input_stage(jnp.asarray(u8),
                                          jax.random.PRNGKey(2),
                                          gauss_light=True, use_norm=True))
    assert np.abs(out - out_b).max() > 1e-3  # rng actually varies the light


@pytest.mark.slow
def test_train_step_device_light_matches_host_normalize():
    """Full SPMD step on uint8 batches (device_light, relight off) ==
    the standard step on the host-normalized f32 batches.

    Tolerances are loose-ish, not exact: XLA canonicalizes the in-step
    /255 + (x-0.5)/0.5 chain (multiply-by-reciprocal, constant folding)
    while the host path is true numpy arithmetic — ~1-ulp input
    differences that the init-state gradients (norm ~1e4) amplify to
    ~5e-4 relative. The plumbing under test (uint8 -> same normalized
    inputs -> same step) is pinned by the loss values at 1e-5."""
    from msml_tpu.core.config import lr_step_factor
    from msml_tpu.core.mesh import make_mesh
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train import optim
    from msml_tpu.train.train_step import init_train_state, make_train_step
    from tests.test_train_step import _cfg

    cfg = _cfg(device_light=True, gauss_light=False)
    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    state0 = init_train_state(model, cfg, rng, mesh)
    lr_scales = optim.build_lr_scales(state0.params, cfg, mesh.shape["data"])

    step_dl = make_train_step(model, cfg, mesh, lr_scales)
    cfg_std = _cfg(gauss_light=False)
    step_std = make_train_step(model, cfg_std, mesh, lr_scales)

    b_u8 = synthetic_batch(cfg.batch_size * mesh.shape["data"],
                           num_classes=cfg.num_classes, uint8=True)
    del b_u8["ori"]
    b_f32 = dict(b_u8)
    b_f32["img"] = ((b_u8["img"].astype(np.float32) / 255.0 - 0.5) / 0.5)

    # the step donates its input state: give each call its own copy
    state0b = jax.tree.map(lambda x: jnp.array(x), state0)
    s1, m1 = step_dl(state0, b_u8, lr_step_factor(cfg, 0), rng)
    s2, m2 = step_std(state0b, b_f32, lr_step_factor(cfg, 0), rng)
    for k in m1:
        rtol = 2e-3 if "norm" in k else 1e-5
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=rtol,
                                   err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4), s1.params, s2.params)


@pytest.mark.slow
def test_train_step_device_light_with_relight_runs():
    """Relight on: uint8 batch trains with finite losses and updates."""
    from msml_tpu.core.config import lr_step_factor
    from msml_tpu.core.mesh import make_mesh
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train import optim
    from msml_tpu.train.train_step import init_train_state, make_train_step
    from tests.test_train_step import _cfg

    cfg = _cfg(device_light=True)
    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, mesh)
    lr_scales = optim.build_lr_scales(state.params, cfg, mesh.shape["data"])
    step = make_train_step(model, cfg, mesh, lr_scales)
    b = synthetic_batch(cfg.batch_size * mesh.shape["data"],
                        num_classes=cfg.num_classes, uint8=True)
    del b["ori"]
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, metrics = step(state, b, lr_step_factor(cfg, 0), rng)
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.abs(np.asarray(jax.tree.leaves(state.params)[0]) -
                  np.asarray(p0)).max() > 0
