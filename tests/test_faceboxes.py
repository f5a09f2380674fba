"""FaceBoxesV2 detector (detect/faceboxes.py): net numerics vs a torch
oracle built to the vendored spec, prior/decode parity vs loop oracles."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from msml_tpu.detect.faceboxes import (CFG, decode,  # noqa: E402
                                       faceboxes_apply,
                                       load_faceboxes_weights, prior_boxes)


class TBasic(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-5)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


class TInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch1x1 = TBasic(128, 32, kernel_size=1, padding=0)
        self.branch1x1_2 = TBasic(128, 32, kernel_size=1, padding=0)
        self.branch3x3_reduce = TBasic(128, 24, kernel_size=1, padding=0)
        self.branch3x3 = TBasic(24, 32, kernel_size=3, padding=1)
        self.branch3x3_reduce_2 = TBasic(128, 24, kernel_size=1, padding=0)
        self.branch3x3_2 = TBasic(24, 32, kernel_size=3, padding=1)
        self.branch3x3_3 = TBasic(32, 32, kernel_size=3, padding=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b2 = self.branch1x1_2(tF.avg_pool2d(x, 3, 1, 1))
        b3 = self.branch3x3(self.branch3x3_reduce(x))
        b4 = self.branch3x3_3(self.branch3x3_2(self.branch3x3_reduce_2(x)))
        return torch.cat([b1, b2, b3, b4], 1)


class TFaceBoxesV2(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TBasic(3, 8, kernel_size=3, stride=2, padding=1)
        self.conv2 = TBasic(8, 16, kernel_size=3, stride=2, padding=1)
        self.conv3 = TBasic(16, 32, kernel_size=3, stride=2, padding=1)
        self.conv4 = TBasic(32, 64, kernel_size=3, stride=2, padding=1)
        self.conv5 = TBasic(64, 128, kernel_size=3, stride=2, padding=1)
        self.inception1 = TInception()
        self.inception2 = TInception()
        self.inception3 = TInception()
        self.conv6_1 = TBasic(128, 128, kernel_size=1, stride=1, padding=0)
        self.conv6_2 = TBasic(128, 256, kernel_size=3, stride=2, padding=1)
        self.conv7_1 = TBasic(256, 128, kernel_size=1, stride=1, padding=0)
        self.conv7_2 = TBasic(128, 256, kernel_size=3, stride=2, padding=1)
        self.loc = tnn.Sequential(
            tnn.Conv2d(128, 21 * 4, 3, padding=1),
            tnn.Conv2d(256, 1 * 4, 3, padding=1),
            tnn.Conv2d(256, 1 * 4, 3, padding=1))
        self.conf = tnn.Sequential(
            tnn.Conv2d(128, 21 * 2, 3, padding=1),
            tnn.Conv2d(256, 1 * 2, 3, padding=1),
            tnn.Conv2d(256, 1 * 2, 3, padding=1))

    def forward(self, x):
        x = self.conv1(x)
        x = self.conv2(x)
        x = self.conv3(x)
        x = self.conv4(x)
        x = self.conv5(x)
        x = self.inception1(x)
        x = self.inception2(x)
        x = self.inception3(x)
        sources = [x]
        x = self.conv6_2(self.conv6_1(x))
        sources.append(x)
        x = self.conv7_2(self.conv7_1(x))
        sources.append(x)
        loc, conf = [], []
        for s, l, c in zip(sources, self.loc, self.conf):
            loc.append(l(s).permute(0, 2, 3, 1).contiguous())
            conf.append(c(s).permute(0, 2, 3, 1).contiguous())
        loc = torch.cat([o.view(o.size(0), -1) for o in loc], 1)
        conf = torch.cat([o.view(o.size(0), -1) for o in conf], 1)
        return (loc.view(loc.size(0), -1, 4),
                tF.softmax(conf.view(conf.size(0), -1, 2), dim=-1))


def _randomize(m):
    torch.manual_seed(0)
    for mod in m.modules():
        if isinstance(mod, tnn.Conv2d):
            tnn.init.normal_(mod.weight, 0, 0.05)
            if mod.bias is not None:
                tnn.init.normal_(mod.bias, 0, 0.02)
        elif isinstance(mod, tnn.BatchNorm2d):
            tnn.init.uniform_(mod.weight, 0.5, 1.5)
            tnn.init.normal_(mod.bias, 0, 0.05)
            mod.running_mean.normal_(0, 0.2)
            mod.running_var.uniform_(0.5, 1.5)
    return m


def test_net_matches_torch_oracle(tmp_path):
    tmodel = _randomize(TFaceBoxesV2()).eval()
    # save in the released format: module.-prefixed
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    torch.save(sd, tmp_path / "fb.pth")
    params = load_faceboxes_weights(str(tmp_path / "fb.pth"))

    rng = np.random.RandomState(0)
    x = rng.randn(1, 128, 160, 3).astype(np.float32) * 20
    loc, conf = faceboxes_apply(params, jnp.asarray(x))
    with torch.no_grad():
        tloc, tconf = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(loc), tloc.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(conf), tconf.numpy(), atol=2e-5)
    # anchors count must match the head output count
    assert prior_boxes((128, 160)).shape[0] == loc.shape[1]


def test_prior_boxes_against_loop_oracle():
    """Transcription of prior_box.py's torch loop as the oracle."""
    from itertools import product
    from math import ceil

    h, w = 96, 128
    anchors = []
    fmaps = [[ceil(h / s), ceil(w / s)] for s in CFG["steps"]]
    for k, f in enumerate(fmaps):
        for i, j in product(range(f[0]), range(f[1])):
            for ms in CFG["min_sizes"][k]:
                s_kx, s_ky = ms / w, ms / h
                if ms == 32:
                    offs = (0, 0.25, 0.5, 0.75)
                elif ms == 64:
                    offs = (0, 0.5)
                else:
                    offs = None
                if offs is None:
                    anchors.append([(j + 0.5) * CFG["steps"][k] / w,
                                    (i + 0.5) * CFG["steps"][k] / h,
                                    s_kx, s_ky])
                else:
                    for cy in [(i + o) * CFG["steps"][k] / h for o in offs]:
                        for cx in [(j + o) * CFG["steps"][k] / w
                                   for o in offs]:
                            anchors.append([cx, cy, s_kx, s_ky])
    want = np.asarray(anchors, np.float32)
    np.testing.assert_allclose(prior_boxes((h, w)), want, atol=1e-7)


def test_decode_matches_torch_formula():
    rng = np.random.RandomState(1)
    loc = rng.randn(50, 4).astype(np.float32) * 0.2
    priors = np.abs(rng.randn(50, 4)).astype(np.float32) * 0.3 + 0.1
    got = decode(loc.copy(), priors.copy(), (0.1, 0.2))
    tl, tp = torch.from_numpy(loc), torch.from_numpy(priors)
    boxes = torch.cat((tp[:, :2] + tl[:, :2] * 0.1 * tp[:, 2:],
                       tp[:, 2:] * torch.exp(tl[:, 2:] * 0.2)), 1)
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    np.testing.assert_allclose(got, boxes.numpy(), atol=1e-6)


def test_detector_end_to_end_mechanics(tmp_path):
    """Full detect() protocol runs (random weights; mechanics only):
    rescale, int mean-sub, decode, NMS, box mapping."""
    tmodel = _randomize(TFaceBoxesV2()).eval()
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    torch.save(sd, tmp_path / "fb.pth")
    from msml_tpu.detect.faceboxes import FaceBoxesDetector
    det = FaceBoxesDetector(str(tmp_path / "fb.pth"))
    img = (np.random.RandomState(2).rand(700, 650, 3) * 255).astype(np.uint8)
    out, scale = det.detect(img, thresh=0.05)
    assert scale == pytest.approx(600.0 / 650)
    for row in out:
        assert row[0] == "face" and len(row) == 6
        assert 0 <= row[1] <= 1


def test_map_detections_reference_truncation():
    """faceboxes_detector.py:100-120: int-truncate corners first, derive
    w/h from truncated corners, truncate again after /im_scale."""
    from msml_tpu.detect.faceboxes import map_detections
    dets = np.array([[10.6, 5.9, 20.4, 15.2, 0.9]], np.float32)
    (out,) = map_detections(dets, 1.0)
    # naive int(20.4-10.6) would give width 9; the reference gives 10
    assert out[2:] == [10, 5, 10, 10]
    (out,) = map_detections(dets, 600.0 / 650.0)
    assert out[2:] == [int(10 / (600 / 650)), int(5 / (600 / 650)),
                       int(10 / (600 / 650)), int(10 / (600 / 650))]
