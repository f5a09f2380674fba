"""Full-MSML checkpoint transliteration parity.

A torch MSML (OSB U-Net + FM operators + iResNet FRB) built to the reference
architecture spec with the reference's state-dict naming
(`backbone.pth` layout: frb.*, frb.fm_ops.N.*, osb.*, classification.*) is
randomly initialised and imported via tools/import_torch.import_msml_checkpoint;
the eval forward (feature, final_seg) must match our NHWC flax MSML — the
end-to-end prerequisite for evaluating the reference's released arc18_msml
checkpoint at parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msml_tpu.core.precision import FULL_PRECISION  # noqa: E402
from msml_tpu.nn.msml import MSML  # noqa: E402
from msml_tpu.tools.import_torch import (import_msml_checkpoint,  # noqa: E402
                                         merge_into)

from tests.test_import_torch import TIBasic  # noqa: E402


def _make_stage(inp, planes, blocks):
    layers = [TIBasic(inp, planes, 2, True)]
    for _ in range(1, blocks):
        layers.append(TIBasic(planes, planes))
    return tnn.Sequential(*layers)


class TGCM(tnn.Module):
    """_GlobalConvModule (unet.py:16-38)."""

    def __init__(self, in_dim, out_dim, k=7):
        super().__init__()
        p = (k - 1) // 2
        self.conv_l1 = tnn.Conv2d(in_dim, out_dim, (k, 1), padding=(p, 0))
        self.conv_l2 = tnn.Conv2d(out_dim, out_dim, (1, k), padding=(0, p))
        self.conv_r1 = tnn.Conv2d(in_dim, out_dim, (1, k), padding=(0, p))
        self.conv_r2 = tnn.Conv2d(out_dim, out_dim, (k, 1), padding=(p, 0))

    def forward(self, x):
        return (self.conv_l2(self.conv_l1(x))
                + self.conv_r2(self.conv_r1(x)))


class TUnet(tnn.Module):
    """Unet spec (unet.py:94-240), r18 encoder, 112 input."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.prelu = tnn.PReLU(64)
        self.layer1 = _make_stage(64, 64, 2)
        self.layer2 = _make_stage(64, 128, 2)
        self.layer3 = _make_stage(128, 256, 2)
        self.layer4 = _make_stage(256, 512, 2)
        self.bn2 = tnn.BatchNorm2d(512, eps=1e-5)
        self.gcm1 = TGCM(512, 8)
        self.gcm2 = TGCM(256, 18)
        self.gcm3 = TGCM(128, 18)
        self.gcm4 = TGCM(64, 18)
        self.gcm5 = TGCM(64, 18)
        self.deconv1 = tnn.ConvTranspose2d(8, 18, 3, 2, 1, bias=False)
        self.deconv2 = tnn.ConvTranspose2d(36, 18, 4, 2, 1, bias=False)
        self.deconv3 = tnn.ConvTranspose2d(36, 18, 4, 2, 1, bias=False)
        self.deconv4 = tnn.ConvTranspose2d(36, 18, 4, 2, 1, bias=False)
        self.deconv5 = tnn.ConvTranspose2d(36, 18, 4, 2, 1, bias=False)
        self.dap = tnn.Sequential(tnn.PixelShuffle(3), tnn.AvgPool2d((3, 3)))

    def forward(self, x):
        x0 = self.prelu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        xx = self.bn2(x4)
        seg0 = self.deconv1(self.gcm1(xx))
        seg1 = self.deconv2(torch.cat((seg0, self.gcm2(x3)), 1))
        seg2 = self.deconv3(torch.cat((seg1, self.gcm3(x2)), 1))
        seg3 = self.deconv4(torch.cat((seg2, self.gcm4(x1)), 1))
        seg5_ = self.deconv5(torch.cat((seg3, self.gcm5(x0)), 1))
        seg5 = self.dap(seg5_)
        return [seg0.detach(), seg1.detach(), seg2.detach(),
                seg3.detach(), seg5]


class TBottle(tnn.Module):
    """resblock_bottle (fmoperator.py:35-68)."""

    def __init__(self, channels):
        super().__init__()
        bottle = channels // 2 if channels <= 128 else 128
        self.conv1 = tnn.Conv2d(channels, bottle, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(bottle, eps=1e-5)
        self.prelu1 = tnn.PReLU(bottle)
        self.conv2 = tnn.Conv2d(bottle, bottle, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(bottle, eps=1e-5)
        self.prelu2 = tnn.PReLU(bottle)
        self.conv3 = tnn.Conv2d(bottle, channels, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(channels, eps=1e-5)
        self.prelu3 = tnn.PReLU(channels)

    def forward(self, x):
        out = self.prelu1(self.bn1(self.conv1(x)))
        out = self.prelu2(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.prelu3(out + x)


class TFMCnn(tnn.Module):
    """FMCnn (fmoperator.py:84-311), sigmoid/mul, no peer."""

    def __init__(self, channel_f):
        super().__init__()
        self.same_conv = tnn.Conv2d(18 + channel_f, channel_f, 3, 1, 1,
                                    bias=False)
        self.res_block = tnn.Sequential(TBottle(channel_f),
                                        TBottle(channel_f))

    def forward(self, yf, yo):
        identity = yf
        x = torch.sigmoid(self.res_block(self.same_conv(
            torch.cat((yf, yo), 1))))
        x = identity * x
        return x + identity


class TFRB(tnn.Module):
    """IResNet FRB (iresnet.py:70-236), 18 layers, with FM hooks."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.prelu = tnn.PReLU(64)
        self.layer1 = _make_stage(64, 64, 2)
        self.layer2 = _make_stage(64, 128, 2)
        self.layer3 = _make_stage(128, 256, 2)
        self.layer4 = _make_stage(256, 512, 2)
        self.bn2 = tnn.BatchNorm2d(512, eps=1e-5)
        self.fc = tnn.Linear(512 * 49, 512)
        self.features = tnn.BatchNorm1d(512, eps=1e-5)
        tnn.init.constant_(self.features.weight, 1.0)
        self.fm_ops = tnn.ModuleList([TFMCnn(c) for c in
                                      (64, 128, 256, 512)])

    def forward(self, x, segs):
        x = self.prelu(self.bn1(self.conv1(x)))
        x = self.fm_ops[0](self.layer1(x), segs[0])
        x = self.fm_ops[1](self.layer2(x), segs[1])
        x = self.fm_ops[2](self.layer3(x), segs[2])
        x = self.fm_ops[3](self.layer4(x), segs[3])
        x = self.bn2(x)
        return self.features(self.fc(torch.flatten(x, 1)))


class TMSML(tnn.Module):
    def __init__(self):
        super().__init__()
        self.frb = TFRB()
        self.osb = TUnet()

    def forward(self, x):
        seg_list = self.osb(x)
        seg_list.reverse()
        final_seg = seg_list[0]
        segs = seg_list[1:]
        return self.frb(x, segs), final_seg


def _randomize(model):
    for m in model.modules():
        if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d)):
            tnn.init.normal_(m.weight, 0, 0.1)
            if m.bias is not None:
                tnn.init.normal_(m.bias, 0, 0.05)
        elif isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            if m is not getattr(model.frb, "features", None):
                tnn.init.uniform_(m.weight, 0.5, 1.5)
            tnn.init.normal_(m.bias, 0, 0.1)
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    tnn.init.constant_(model.frb.features.weight, 1.0)


@pytest.mark.slow
def test_full_msml_import_parity():
    torch.manual_seed(0)
    tmodel = TMSML()
    _randomize(tmodel)
    tmodel.eval()

    params_in, stats_in = import_msml_checkpoint(tmodel.state_dict())

    model = MSML(frb_type="iresnet18", num_classes=16, use_osb=True,
                 header_type="AMArcFace", header_params=(64.0, 0.48, 0, 0),
                 fm_params=(3, 2, "sigmoid", "mul"), policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(0).randn(2, 112, 112, 3).astype(np.float32)
    variables = model.init({"params": rng, "dropout": rng}, jnp.asarray(x),
                           jnp.zeros((2,), jnp.int32), train=True)
    params = merge_into(jax.device_get(variables["params"]), params_in)
    stats = merge_into(jax.device_get(variables["batch_stats"]), stats_in)

    feat, seg = model.apply({"params": params, "batch_stats": stats},
                            jnp.asarray(x), train=False)
    with torch.no_grad():
        tfeat, tseg = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    got = np.asarray(feat)
    want = tfeat.numpy()
    cos = (got * want).sum(1) / (np.linalg.norm(got, axis=1)
                                 * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos

    got_seg = np.asarray(seg)                       # NHWC
    want_seg = tseg.numpy().transpose(0, 2, 3, 1)   # NCHW -> NHWC
    assert got_seg.shape == want_seg.shape
    # seg values are small decoder logits; compare with scaled tolerance
    scale = max(np.abs(want_seg).max(), 1e-3)
    np.testing.assert_allclose(got_seg / scale, want_seg / scale, atol=5e-3)
