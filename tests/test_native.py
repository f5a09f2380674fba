"""C++ native tools vs reference-grade oracles (skimage umeyama, numpy NMS)."""

import numpy as np
import pytest

from msml_tpu.tools import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.have_native():
        try:
            native.build()
        except Exception as e:  # pragma: no cover
            pytest.skip(f"native build unavailable: {e}")
    assert native.have_native()


def _landmarks(seed):
    rng = np.random.RandomState(seed)
    # a plausible 5-pt landmark set: template + noise + global similarity
    base = native.ARCFACE_DST.copy()
    theta = rng.uniform(-0.4, 0.4)
    s = rng.uniform(0.7, 1.5)
    R = s * np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
    t = rng.uniform(-20, 20, 2)
    return (base @ R.T + t + rng.randn(5, 2) * 1.5).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_umeyama_cpp_matches_numpy_umeyama(seed):
    """The numpy path implements the full Umeyama SVD math (the same math as
    skimage.SimilarityTransform.estimate used by the reference alignment);
    the C++ closed form must agree."""
    src = _landmarks(seed)
    dst = native.ARCFACE_DST
    want = native.similar_transform(src, dst, force_numpy=True)
    got_cpp = native.similar_transform(src, dst)
    np.testing.assert_allclose(got_cpp, want, rtol=1e-3, atol=1e-3)


def test_umeyama_recovers_exact_similarity():
    rng = np.random.RandomState(7)
    src = rng.rand(5, 2).astype(np.float32) * 100
    theta, s, t = 0.3, 1.7, np.array([10.0, -5.0])
    R = s * np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]], np.float32)
    dst = (src @ R.T + t).astype(np.float32)
    T = native.similar_transform(src, dst)
    src_h = np.concatenate([src, np.ones((5, 1), np.float32)], 1)
    np.testing.assert_allclose(src_h @ T.T[:, :2], dst, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_cpp_matches_numpy(seed):
    rng = np.random.RandomState(seed)
    n = 200
    xy = rng.rand(n, 2) * 80
    wh = rng.rand(n, 2) * 40 + 5
    dets = np.concatenate([xy, xy + wh, rng.rand(n, 1)], 1).astype(np.float32)
    for thresh in (0.3, 0.5, 0.7):
        got = native.nms(dets, thresh)
        want = native.nms(dets, thresh, force_numpy=True)
        np.testing.assert_array_equal(got, want)


def test_bbox_overlaps_cpp_matches_numpy():
    rng = np.random.RandomState(0)
    boxes = np.sort(rng.rand(50, 4) * 100, axis=-1).astype(np.float32)
    query = np.sort(rng.rand(8, 4) * 100, axis=-1).astype(np.float32)
    got = native.bbox_overlaps(boxes, query)
    want = native.bbox_overlaps(boxes, query, force_numpy=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_norm_crop_shape():
    rng = np.random.RandomState(0)
    img = (rng.rand(160, 160, 3) * 255).astype(np.uint8)
    lmk = _landmarks(5) + 20
    out = native.norm_crop(img, lmk)
    assert out.shape == (112, 112, 3)


def test_rle_roundtrip_cpp_and_numpy():
    """COCO RLE encode/decode parity (maskApi.c capability)."""
    rng = np.random.RandomState(0)
    mask = (rng.rand(23, 17) > 0.6).astype(np.uint8)
    for force in (False, True):
        rle = native.rle_encode(mask, force_numpy=force)
        assert rle["size"] == (23, 17)
        dec = native.rle_decode(rle, force_numpy=force)
        np.testing.assert_array_equal(dec, mask)
        assert native.rle_area(rle) == int(mask.sum())
    # cpp and numpy produce identical counts
    a = native.rle_encode(mask, force_numpy=False)["counts"]
    b = native.rle_encode(mask, force_numpy=True)["counts"]
    assert a == b
    # all-zero and all-one masks
    for m in (np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)):
        rle = native.rle_encode(m)
        np.testing.assert_array_equal(native.rle_decode(rle), m)


def test_anchor_grid_matches_loop():
    """anchors.pyx loop semantics."""
    base = np.array([[-8, -8, 8, 8], [-16, -16, 16, 16]], np.float32)
    got = native.anchor_grid(3, 4, 16, base)
    assert got.shape == (3, 4, 2, 4)
    for ih in range(3):
        for iw in range(4):
            for k in range(2):
                want = base[k] + np.array([iw * 16, ih * 16] * 2)
                np.testing.assert_array_equal(got[ih, iw, k], want)
