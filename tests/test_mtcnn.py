"""MTCNN detector (detect/mtcnn.py): layer/numerics parity against a torch
oracle built to the public architecture spec (get_nets.py), plus the cascade
mechanics end-to-end with the reference's vendored weights when present."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from msml_tpu.detect.mtcnn import (MTCNN, calibrate_box,  # noqa: E402
                                   convert_to_square, load_mtcnn_weights,
                                   nms, onet_apply, pnet_apply, rnet_apply)

REF_WEIGHTS = "/root/reference/eval/preprocess/mtcnn_pytorch/src/weights"


class TFlatten(tnn.Module):
    def forward(self, x):
        return x.transpose(3, 2).contiguous().view(x.size(0), -1)


class TPNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 10, 3, 1), tnn.PReLU(10),
            tnn.MaxPool2d(2, 2, ceil_mode=True),
            tnn.Conv2d(10, 16, 3, 1), tnn.PReLU(16),
            tnn.Conv2d(16, 32, 3, 1), tnn.PReLU(32))
        self.conv4_1 = tnn.Conv2d(32, 2, 1, 1)
        self.conv4_2 = tnn.Conv2d(32, 4, 1, 1)

    def forward(self, x):
        x = self.features(x)
        # width-softmax quirk, as in the reference get_nets.py:71
        return self.conv4_2(x), tF.softmax(self.conv4_1(x), dim=-1)


class TRNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 28, 3, 1), tnn.PReLU(28),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            tnn.Conv2d(28, 48, 3, 1), tnn.PReLU(48),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            tnn.Conv2d(48, 64, 2, 1), tnn.PReLU(64),
            TFlatten(), tnn.Linear(576, 128), tnn.PReLU(128))
        self.conv5_1 = tnn.Linear(128, 2)
        self.conv5_2 = tnn.Linear(128, 4)

    def forward(self, x):
        x = self.features(x)
        return self.conv5_2(x), tF.softmax(self.conv5_1(x), dim=-1)


class TONet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 1), tnn.PReLU(32),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            tnn.Conv2d(32, 64, 3, 1), tnn.PReLU(64),
            tnn.MaxPool2d(3, 2, ceil_mode=True),
            tnn.Conv2d(64, 64, 3, 1), tnn.PReLU(64),
            tnn.MaxPool2d(2, 2, ceil_mode=True),
            tnn.Conv2d(64, 128, 2, 1), tnn.PReLU(128),
            TFlatten(), tnn.Linear(1152, 256), tnn.Dropout(0.25),
            tnn.PReLU(256))
        self.conv6_1 = tnn.Linear(256, 2)
        self.conv6_2 = tnn.Linear(256, 4)
        self.conv6_3 = tnn.Linear(256, 10)

    def forward(self, x):
        x = self.features(x)
        return (self.conv6_3(x), self.conv6_2(x),
                tF.softmax(self.conv6_1(x), dim=-1))


def _save_torch_weights(tmp_path):
    """Random torch nets -> the public .npy dict format."""
    torch.manual_seed(0)
    nets = {"pnet": TPNet().eval(), "rnet": TRNet().eval(),
            "onet": TONet().eval()}
    feature_names = {
        "pnet": ["conv1", "prelu1", "pool1", "conv2", "prelu2",
                 "conv3", "prelu3"],
        "rnet": ["conv1", "prelu1", "pool1", "conv2", "prelu2", "pool2",
                 "conv3", "prelu3", "flatten", "conv4", "prelu4"],
        "onet": ["conv1", "prelu1", "pool1", "conv2", "prelu2", "pool2",
                 "conv3", "prelu3", "pool3", "conv4", "prelu4", "flatten",
                 "conv5", "drop5", "prelu5"],
    }
    for name, net in nets.items():
        d = {}
        for pname, p in net.named_parameters():
            if pname.startswith("features."):
                idx = int(pname.split(".")[1])
                mapped = ("features." + feature_names[name][idx]
                          + "." + pname.split(".")[-1])
                # onet has drop5 between conv5 and prelu5 in the name list
                d[mapped] = p.detach().numpy()
            else:
                d[pname] = p.detach().numpy()
        np.save(tmp_path / f"{name}.npy", d)
    return nets


@pytest.mark.slow
def test_nets_match_torch_oracle(tmp_path):
    nets = _save_torch_weights(tmp_path)
    pnet, rnet, onet = load_mtcnn_weights(str(tmp_path))
    rng = np.random.RandomState(0)

    x = rng.randn(1, 37, 51, 3).astype(np.float32)  # odd sizes: ceil pools
    off, prob = pnet_apply(pnet, jnp.asarray(x))
    with torch.no_grad():
        toff, tprob = nets["pnet"](torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(off),
                               toff.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob),
                               tprob.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5)

    x = rng.randn(3, 24, 24, 3).astype(np.float32)
    off, prob = rnet_apply(rnet, jnp.asarray(x))
    with torch.no_grad():
        toff, tprob = nets["rnet"](torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(off), toff.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), atol=2e-5)

    x = rng.randn(3, 48, 48, 3).astype(np.float32)
    lmk, off, prob = onet_apply(onet, jnp.asarray(x))
    with torch.no_grad():
        tlmk, toff, tprob = nets["onet"](torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(lmk), tlmk.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(off), toff.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), atol=2e-5)


def test_box_utils_semantics():
    boxes = np.array([[10, 10, 30, 30, 0.9],
                      [12, 12, 32, 32, 0.8],
                      [100, 100, 120, 120, 0.7]], np.float64)
    keep = nms(boxes, 0.5)
    assert keep[0] == 0 and 2 in keep and 1 not in keep

    sq = convert_to_square(np.array([[0, 0, 9, 19, 1.0]]))
    w = sq[0, 2] - sq[0, 0] + 1
    h = sq[0, 3] - sq[0, 1] + 1
    assert w == h == 20

    cal = calibrate_box(np.array([[0., 0., 9., 9., 1.0]]),
                        np.array([[0.1, 0.2, -0.1, -0.2]]))
    np.testing.assert_allclose(cal[0, :4], [1.0, 2.0, 8.0, 7.0])


@pytest.mark.skipif(not os.path.isdir(REF_WEIGHTS),
                    reason="reference MTCNN weights not available")
@pytest.mark.slow
def test_cascade_end_to_end_with_reference_weights():
    """Real public weights: the cascade must detect a synthetic frontal
    face (drawn with eyes/nose/mouth blobs) and return 5-pt landmarks
    inside the face box."""
    det = MTCNN(REF_WEIGHTS)
    rng = np.random.RandomState(0)
    img = np.full((160, 160, 3), 110, np.uint8)
    img += (rng.rand(160, 160, 3) * 12).astype(np.uint8)
    yy, xx = np.mgrid[0:160, 0:160]
    face = ((yy - 80) / 55.0) ** 2 + ((xx - 80) / 42.0) ** 2 < 1
    img[face] = (224, 178, 148)
    for cx, cy, r, col in ((62, 66, 5, (40, 30, 30)),    # left eye
                           (98, 66, 5, (40, 30, 30)),    # right eye
                           (80, 88, 4, (170, 120, 100)),  # nose
                           (80, 106, 6, (120, 50, 50))):  # mouth
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
        img[blob] = col
    pil = Image.fromarray(img)
    boxes, lmk = det.detect_faces(pil, min_face_size=40.0,
                                  thresholds=(0.6, 0.6, 0.6))
    assert len(boxes) >= 1, "no face found on the synthetic face"
    x1, y1, x2, y2 = boxes[0, :4]
    pts = det.landmarks5(pil, min_face_size=40.0, thresholds=(0.6, 0.6, 0.6))
    assert pts.shape == (5, 2)
    assert (pts[:, 0] > x1 - 10).all() and (pts[:, 0] < x2 + 10).all()
    assert (pts[:, 1] > y1 - 10).all() and (pts[:, 1] < y2 + 10).all()
    aligned = det.align(pil, min_face_size=40.0, thresholds=(0.6, 0.6, 0.6))
    assert aligned is not None and aligned.size == (112, 112)


def test_crop_boxes_degenerate_is_black():
    """Degenerate boxes (w/h <= 0) must be preprocessed-BLACK crops like
    the reference (which preprocesses every blank crop) — raw zeros read
    as mid-gray and can survive RNet/ONet as bogus detections."""
    from PIL import Image

    from msml_tpu.detect.mtcnn import _crop_boxes
    img = Image.fromarray(np.full((40, 40, 3), 200, np.uint8))
    boxes = np.array([[30.0, 30.0, 10.0, 10.0, 0.9],    # x2 < x1: degenerate
                      [0.0, 0.0, 39.0, 39.0, 0.9]], np.float32)
    out = _crop_boxes(boxes, img, 24)
    black = (0.0 - 127.5) * 0.0078125
    np.testing.assert_allclose(out[0], black)
    np.testing.assert_allclose(out[1], (200.0 - 127.5) * 0.0078125,
                               atol=1e-3)
