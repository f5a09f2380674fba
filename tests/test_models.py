"""Shape/contract tests for the model zoo, mirroring the reference's
__main__ smoke blocks (`backbones/msml.py:177-227`, `unet.py:282-309`,
`fmoperator.py:328-377`, `lightcnn.py:310-360`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msml_tpu.core.precision import FULL_PRECISION
from msml_tpu.nn.fm import FMCnn
from msml_tpu.nn.msml import MSML
from msml_tpu.nn.unet import Unet

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_unet_output_shapes_112():
    """unet.py:284-295: rgb-112 -> seg0..3 at 7/14/28/56 (18ch), seg5 at
    112 (2ch)."""
    osb = Unet(input_size=112, policy=FULL_PRECISION)
    x = jnp.zeros((1, 112, 112, 3))
    variables = osb.init(KEY, x, train=False)
    segs = osb.apply(variables, x, train=False)
    assert [s.shape for s in segs] == [
        (1, 7, 7, 18), (1, 14, 14, 18), (1, 28, 28, 18), (1, 56, 56, 18),
        (1, 112, 112, 2)]


@pytest.mark.slow
def test_unet_output_shapes_128():
    """unet.py:297-305: gray-128 -> 8/16/32/64 + 128."""
    osb = Unet(input_size=128, policy=FULL_PRECISION)
    x = jnp.zeros((1, 128, 128, 1))
    variables = osb.init(KEY, x, train=False)
    segs = osb.apply(variables, x, train=False)
    assert [s.shape for s in segs] == [
        (1, 8, 8, 18), (1, 16, 16, 18), (1, 32, 32, 18), (1, 64, 64, 18),
        (1, 128, 128, 2)]


@pytest.mark.slow
@pytest.mark.parametrize("h,cf", [(56, 64), (28, 128), (14, 256), (7, 512)])
def test_fm_shapes(h, cf):
    """fmoperator.py:350-371: output matches yf shape at every stage."""
    fm = FMCnn(channel_f=cf, policy=FULL_PRECISION)
    yf = jax.random.normal(KEY, (1, h, h, cf))
    yo = jax.random.normal(KEY, (1, h, h, 18))
    variables = fm.init(KEY, yf, yo)
    z, kd = fm.apply(variables, yf, yo)
    assert z.shape == yf.shape
    assert kd is None


def _msml(frb, header, **kw):
    return MSML(frb_type=frb, num_classes=200, header_type=header,
                header_params=(64.0, 0.4, 0.0, 0.0), policy=FULL_PRECISION,
                **kw)


@pytest.mark.slow
def test_msml_iresnet_contract():
    """msml.py:186-205: iresnet-rgb-112 eval -> (feature 512, seg 112x112x2);
    train -> (logits, seg, kd)."""
    model = _msml("iresnet18", "AMArcFace", use_ori=True, use_conv=True)
    x = jax.random.normal(KEY, (2, 112, 112, 3))
    label = jnp.array([1, 2], jnp.int32)
    variables = model.init({"params": KEY, "dropout": KEY}, x, label, x,
                           train=True)
    feat, seg = model.apply(variables, x, train=False)
    assert feat.shape == (2, 512) and seg.shape == (2, 112, 112, 2)
    (cls, seg, kd), _ = model.apply(
        variables, x, label, x, train=True, rngs={"dropout": KEY},
        mutable=["batch_stats"])
    assert cls.shape == (2, 200)
    assert np.isfinite(float(kd)) and float(kd) > 0


@pytest.mark.slow
def test_msml_lightcnn_contract():
    """msml.py:207-223: lightcnn-gray-128 -> feature 256, seg 128x128x2."""
    model = _msml("lightcnn", "Softmax")
    x = jax.random.normal(KEY, (2, 128, 128, 1))
    label = jnp.array([1, 2], jnp.int32)
    variables = model.init({"params": KEY, "dropout": KEY}, x, label,
                           train=True)
    feat, seg = model.apply(variables, x, train=False)
    assert feat.shape == (2, 256) and seg.shape == (2, 128, 128, 2)


@pytest.mark.slow
def test_msml_no_osb():
    """use_osb=False: segs None, eval seg None (msml.py:159-161)."""
    model = _msml("iresnet18", "AMCosFace", use_osb=False,
                  fm_layers=(0, 0, 0, 0))
    x = jax.random.normal(KEY, (1, 112, 112, 3))
    variables = model.init({"params": KEY, "dropout": KEY}, x,
                           jnp.zeros((1,), jnp.int32), train=True)
    feat, seg = model.apply(variables, x, train=False)
    assert feat.shape == (1, 512) and seg is None


def test_dap_equals_pixelshuffle_avgpool():
    """nn/common.dap == torch PixelShuffle(3)+AvgPool2d(3) (unet.py:158-161)."""
    torch = pytest.importorskip("torch")
    from msml_tpu.nn.common import dap

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 18).astype(np.float32)
    got = np.asarray(dap(jnp.asarray(x), num_classes=2, k=3))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.AvgPool2d((3, 3))(torch.nn.PixelShuffle(3)(xt))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_transpose_matches_torch():
    """ConvTranspose2d parity incl. the k=3 deconv1 case (unet.py:141-148)."""
    torch = pytest.importorskip("torch")
    from msml_tpu.nn.common import ConvTranspose2d

    rng = np.random.RandomState(0)
    for k, s, p, hin in [(4, 2, 1, 4), (3, 2, 1, 4), (4, 2, 1, 56)]:
        x = rng.randn(1, hin, hin, 8).astype(np.float32)
        w = rng.randn(k, k, 5, 8).astype(np.float32)  # (kh, kw, out, in)
        mod = ConvTranspose2d(5, k, s, p)
        variables = {"params": {"kernel": jnp.asarray(w)}}
        got = np.asarray(mod.apply(variables, jnp.asarray(x)))
        # torch weight layout (in, out, kh, kw)
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = torch.nn.functional.conv_transpose2d(
            xt, wt, stride=s, padding=p).numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, (k, s, p, hin)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_selective_remat_preserves_semantics():
    """remat=[3, 4] (stage-selective) must match remat=False as closely as
    the established remat=True does — remat only changes scheduling, but
    f32 BN grads carry reduction-order noise on near-cancelling leaves, so
    the bound is comparative rather than absolute."""
    import jax
    import jax.numpy as jnp
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.nn.fm import FMNone
    from msml_tpu.nn.iresnet import IResNet

    x = jnp.asarray(np.random.RandomState(0).randn(2, 112, 112, 3),
                    jnp.float32)
    segs = peers = (None, None, None, None)

    outs = {}
    for key, remat in (("plain", False), ("full", True), ("sel", [3, 4])):
        model = IResNet(layers=(2, 2, 2, 2),
                        fm_ops=[FMNone() for _ in range(4)],
                        remat=remat, policy=FULL_PRECISION)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(0)},
                               x, segs, peers, True)

        def loss(params):
            (feat, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, segs, peers, True, mutable=["batch_stats"])
            return jnp.sum(feat ** 2)

        outs[key] = (float(loss(variables["params"])),
                     jax.grad(loss)(variables["params"]))

    np.testing.assert_allclose(outs["plain"][0], outs["sel"][0], rtol=1e-4)
    np.testing.assert_allclose(outs["plain"][0], outs["full"][0], rtol=1e-4)
    for pl, fu, se in zip(jax.tree.leaves(outs["plain"][1]),
                          jax.tree.leaves(outs["full"][1]),
                          jax.tree.leaves(outs["sel"][1])):
        scale = float(jnp.max(jnp.abs(pl))) + 1e-9
        d_full = float(jnp.max(jnp.abs(fu - pl))) / scale
        d_sel = float(jnp.max(jnp.abs(se - pl))) / scale
        assert d_sel <= 2.0 * d_full + 1e-4, (d_sel, d_full)


@pytest.mark.slow
def test_width_mult_doubles_frb_channels():
    """width_mult=2 (the TPU capacity dividend, PERF.md r4): every FRB
    stage doubles its channel width, FM operators follow, the embedding
    contract is unchanged, and train/eval forwards run."""
    model = MSML(frb_type="iresnet18", use_osb=True, fm_layers=(1, 1, 1, 1),
                 fm_params=(3, 2, "sigmoid", "mul"), num_classes=16,
                 width_mult=2, policy=FULL_PRECISION)
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    v = model.init({"params": KEY, "dropout": KEY}, x, label, None,
                   train=True)
    k1 = v["params"]["frb"]["layer1"]["block0"]["conv1"]["kernel"]
    assert k1.shape == (3, 3, 128, 128), k1.shape
    k4 = v["params"]["frb"]["layer4"]["block0"]["conv1"]["kernel"]
    assert k4.shape[-1] == 1024, k4.shape
    (cls, seg, kd), _ = model.apply(v, x, label, None, train=True,
                                    rngs={"dropout": KEY},
                                    mutable=["batch_stats", "losses"])
    assert cls.shape == (2, 16) and seg.shape[-1] == 2
    feat, _ = model.apply(v, x, train=False)
    assert feat.shape == (2, 512)   # embedding contract unchanged
