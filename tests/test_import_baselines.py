"""Baseline checkpoint transliteration parity: sphere/cosface2018."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msml_tpu.core.precision import FULL_PRECISION  # noqa: E402
from msml_tpu.nn.baselines import Sphere  # noqa: E402
from msml_tpu.tools.import_torch import import_sphere, merge_into  # noqa: E402


class TSphereBlock(tnn.Module):
    """cosface2018.py:7-16."""

    def __init__(self, planes):
        super().__init__()
        self.conv1 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.prelu1 = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.prelu2 = tnn.PReLU(planes)

    def forward(self, x):
        return x + self.prelu2(self.conv2(self.prelu1(self.conv1(x))))


class TSphere(tnn.Module):
    """sphere20 (cosface2018.py:19-73), (112, 96) input."""

    def __init__(self):
        super().__init__()
        layers = (1, 2, 4, 1)
        planes = (64, 128, 256, 512)
        inp = 3
        for li in range(4):
            seq = [tnn.Conv2d(inp, planes[li], 3, 2, 1),
                   tnn.PReLU(planes[li])]
            seq += [TSphereBlock(planes[li]) for _ in range(layers[li])]
            setattr(self, f"layer{li + 1}", tnn.Sequential(*seq))
            inp = planes[li]
        self.fc = tnn.Linear(512 * 7 * 6, 512)
        for m in self.modules():
            if isinstance(m, (tnn.Conv2d, tnn.Linear)):
                tnn.init.normal_(m.weight, 0, 0.05)
                if m.bias is not None:
                    tnn.init.normal_(m.bias, 0, 0.02)

    def forward(self, x):
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(x, 1))


@pytest.mark.slow
def test_sphere_import_forward_parity():
    torch.manual_seed(0)
    tmodel = TSphere().eval()
    params_in, _ = import_sphere(tmodel.state_dict())

    model = Sphere(net_type=20, input_size=(112, 96), policy=FULL_PRECISION)
    x = np.random.RandomState(0).randn(2, 112, 96, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_into(jax.device_get(variables["params"]), params_in)
    feat = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(feat)
    cos = (got * want).sum(1) / (np.linalg.norm(got, axis=1)
                                 * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos


class TBlockIR(tnn.Module):
    """from2021.py:52-84 (prelu1 naming)."""

    def __init__(self, inp, planes, stride, dim_match):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(inp, eps=1e-5)
        self.conv1 = tnn.Conv2d(inp, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.prelu1 = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.downsample = None
        if not dim_match:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes, eps=1e-5))

    def forward(self, x):
        out = self.bn3(self.conv2(self.prelu1(self.bn2(self.conv1(
            self.bn1(x))))))
        res = x if self.downsample is None else self.downsample(x)
        return out + res


class TPyramid(tnn.Module):
    """from2021.py:4-49."""

    def __init__(self, c3, c4, c5, f=256):
        super().__init__()
        self.P5_1 = tnn.Conv2d(c5, f, 1)
        self.P5_up = tnn.Upsample(scale_factor=2, mode="nearest")
        self.P5_2 = tnn.Conv2d(f, f, 3, 1, 1)
        self.P4_1 = tnn.Conv2d(c4, f, 1)
        self.P4_up = tnn.Upsample(scale_factor=2, mode="nearest")
        self.P4_2 = tnn.Conv2d(f, f, 3, 1, 1)
        self.P3_1 = tnn.Conv2d(c3, f, 1)
        self.P3_2 = tnn.Conv2d(f, f, 3, 1, 1)
        self.P6 = tnn.Conv2d(c5, f, 3, 2, 1)
        self.P7_2 = tnn.Conv2d(f, f, 3, 2, 1)

    def forward(self, inputs):
        c3, c4, c5 = inputs
        p5 = self.P5_1(c5)
        p4 = self.P4_1(c4) + self.P5_up(p5)
        p3 = self.P3_1(c3) + self.P4_up(p4)
        return [self.P3_2(p3), self.P4_2(p4), self.P5_2(p5)]


class TLResNetOcc(tnn.Module):
    """from2021.py:291-373, 50E-IR depth, (112, 96)."""

    def __init__(self, num_mask=226):
        super().__init__()
        layers = (3, 4, 14, 3)
        planes = (64, 128, 256, 512)
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.prelu1 = tnn.PReLU(64)
        inp = 64
        for li in range(4):
            blocks = [TBlockIR(inp, planes[li], 2, False)]
            inp = planes[li]
            blocks += [TBlockIR(inp, planes[li], 1, True)
                       for _ in range(1, layers[li])]
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
        self.mask = tnn.Sequential(
            tnn.Conv2d(256, 256, 3, 2, 1, bias=False), tnn.PReLU(256),
            tnn.BatchNorm2d(256, eps=1e-5),
            tnn.Conv2d(256, 512, 3, 2, 1, bias=False), tnn.Sigmoid())
        self.fpn = TPyramid(128, 256, 512)
        self.regress = tnn.Sequential(
            tnn.BatchNorm1d(512 * 7 * 6, eps=1e-5), tnn.Dropout(0.5),
            tnn.Linear(512 * 7 * 6, num_mask, bias=False),
            tnn.BatchNorm1d(num_mask, eps=1e-5))
        self.fc = tnn.Sequential(
            tnn.BatchNorm1d(512 * 7 * 6, eps=1e-5), tnn.Dropout(0.5),
            tnn.Linear(512 * 7 * 6, 512), tnn.BatchNorm1d(512, eps=1e-5))

    def forward(self, x):
        x = self.prelu1(self.bn1(self.conv1(x)))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        fmap = self.layer4(x3)
        feats = self.fpn([x2, x3, fmap])
        mask = self.mask(feats[0])
        vec = self.regress(mask.reshape(mask.size(0), -1))
        fmap_mask = fmap * mask
        fc_mask = self.fc(fmap_mask.reshape(fmap_mask.size(0), -1))
        fc = self.fc(fmap.reshape(fmap.size(0), -1))
        return fc_mask, mask, vec, fc


def _rand_init(model):
    for m in model.modules():
        if isinstance(m, (tnn.Conv2d, tnn.Linear)):
            tnn.init.normal_(m.weight, 0, 0.05)
            if m.bias is not None:
                tnn.init.normal_(m.bias, 0, 0.02)
        elif isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            tnn.init.uniform_(m.weight, 0.5, 1.5)
            tnn.init.normal_(m.bias, 0, 0.1)
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)


@pytest.mark.slow
def test_from2021_import_forward_parity():
    from msml_tpu.nn.from2021 import From2021
    from msml_tpu.tools.import_torch import import_from2021

    torch.manual_seed(1)
    tmodel = TLResNetOcc().eval()
    _rand_init(tmodel)

    params_in, stats_in = import_from2021(tmodel.state_dict())

    model = From2021(policy=FULL_PRECISION)
    x = np.random.RandomState(1).randn(2, 112, 96, 3).astype(np.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, jnp.asarray(x),
                           train=False)
    params = merge_into(jax.device_get(variables["params"]), params_in)
    stats = merge_into(jax.device_get(variables["batch_stats"]), stats_in)

    feat = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    with torch.no_grad():
        _, _, _, want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = np.asarray(feat)
    want = want.numpy()
    cos = (got * want).sum(1) / (np.linalg.norm(got, axis=1)
                                 * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos
