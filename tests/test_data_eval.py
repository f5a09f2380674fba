"""Data-layer + occlusion-sweep tests: RecordIO round-trip, .bin loading,
RandomBlock semantics, TAR@FAR vectorisation vs the reference's loop math."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from msml_tpu.data.bin_loader import load_bin, load_bin_pil
from msml_tpu.data.rand_occ import (NoneOcc, RandomBlock, RandomEllipse,
                                    RandomRect)
from msml_tpu.data.recordio import (IndexedRecordIO, IRHeader, imdecode,
                                    imencode, pack, unpack)
from msml_tpu.eval.occ_sweep import occlusion_sweep, roc_acc_and_tarfar


def _rand_img(rng, size=112):
    # smooth random image (JPEG-friendly, unlike white noise)
    small = rng.rand(8, 8, 3) * 255
    img = np.asarray(Image.fromarray(small.astype(np.uint8)).resize(
        (size, size), Image.BILINEAR))
    return img.astype(np.uint8)


def test_recordio_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    rec = str(tmp_path / "t.rec")
    idx = str(tmp_path / "t.idx")
    w = IndexedRecordIO(idx, rec, "w")
    imgs = []
    for k in range(5):
        img = _rand_img(rng)
        imgs.append(img)
        payload = pack(IRHeader(0, float(k % 3), k, 0), imencode(img))
        w.write_idx(k, payload)
    w.close()

    r = IndexedRecordIO(idx, rec, "r")
    assert len(r) == 5
    for k in range(5):
        header, buf = unpack(r.read_idx(k))
        assert header.label == float(k % 3)
        dec = imdecode(buf)
        assert dec.shape == (112, 112, 3)
        # JPEG lossy: decoded should correlate strongly with the original
        assert np.abs(dec.astype(int) - imgs[k].astype(int)).mean() < 40


def test_recordio_extended_label(tmp_path):
    rec, idx = str(tmp_path / "v.rec"), str(tmp_path / "v.idx")
    w = IndexedRecordIO(idx, rec, "w")
    w.write_idx(0, pack(IRHeader(2, [7.0, 9.0], 0, 0), b""))
    w.close()
    r = IndexedRecordIO(idx, rec, "r")
    header, rest = unpack(r.read_idx(0))
    assert header.flag == 2
    np.testing.assert_array_equal(header.label, np.array([7.0, 9.0],
                                                         np.float32))


def test_bin_loader(tmp_path):
    rng = np.random.RandomState(1)
    n_pairs = 3
    bins = [imencode(_rand_img(rng)) for _ in range(2 * n_pairs)]
    issame = [True, False, True]
    path = str(tmp_path / "lfw.bin")
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f)

    data_list, got_issame = load_bin(path)
    assert got_issame == issame
    assert data_list[0].shape == (6, 112, 112, 3)
    # flipped copy is a width flip
    np.testing.assert_array_equal(data_list[1], data_list[0][:, :, ::-1, :])

    imgs, _ = load_bin_pil(path)
    assert len(imgs) == 6 and imgs[0].size == (112, 112)


def test_random_block_area():
    rng = np.random.RandomState(0)
    img = Image.fromarray(np.full((112, 112, 3), 200, np.uint8))
    occ = RandomBlock(40, 41, "black")(img, rng)
    arr = np.asarray(occ)
    frac = (arr == 0).all(axis=2).mean()
    want = int((0.40 * 112 * 112) ** 0.5) ** 2 / 112 ** 2
    assert abs(frac - want) < 0.01
    # lo=0 -> unmodified
    same = RandomBlock(0, 1, "black")(img, rng)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(img))


def test_train_transforms_return_img_and_mask():
    rng = np.random.RandomState(0)
    img = Image.fromarray(np.full((112, 112, 3), 128, np.uint8))
    for trans in [NoneOcc(), RandomRect(), RandomEllipse()]:
        out, msk = trans(img, rng)
        assert out.size == (112, 112)
        m = np.asarray(msk)
        assert m.shape == (112, 112)
        assert set(np.unique(m)) <= {0, 255}
    # NoneOcc mask is all clean
    _, m0 = NoneOcc()(img, rng)
    assert (np.asarray(m0) == 255).all()


def _loop_tarfar(pos_dist, neg_dist, far_vals):
    """Direct transcription of the reference loop math
    (qeval_mxnet.py:452-481) as the oracle."""
    out = np.zeros(len(far_vals))
    neg_cnt, pos_cnt = len(neg_dist), len(pos_dist)
    for idx, fv in enumerate(far_vals):
        if idx > 3:
            continue
        thresholds = []
        for T in neg_dist:
            far = sum(1.0 for x in neg_dist if x < T) / neg_cnt
            if far <= fv:
                thresholds.append(T)
        acc = 0.0
        for T in thresholds:
            tar = sum(1.0 for x in pos_dist if x <= T) / pos_cnt
            acc = max(acc, tar)
        out[idx] = acc
    return out


def test_tarfar_vectorization_matches_loop():
    rng = np.random.RandomState(2)
    n = 40
    feats = rng.randn(2 * n, 16)
    # make same pairs correlated
    issame = (rng.rand(n) > 0.5).tolist()
    for i in range(n):
        if issame[i]:
            feats[2 * i + 1] = feats[2 * i] + 0.1 * rng.randn(16)
    from msml_tpu.eval.verification import l2_normalize_np
    fn = l2_normalize_np(feats)
    e1, e2 = fn[0::2], fn[1::2]
    dist = 1.0 - np.sum(e1 * e2, axis=1)
    label = np.array([0 if s else 1 for s in issame])
    pos, neg = dist[label == 0], dist[label == 1]
    want = _loop_tarfar(pos.tolist(), neg.tolist(),
                        [1e-1, 1e-2, 1e-3, 1e-4, 1e-5])
    _, got = roc_acc_and_tarfar(feats, issame)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_occlusion_sweep_no_occ_smoke():
    """End-to-end sweep with a deterministic toy extractor."""
    rng = np.random.RandomState(3)
    n_pairs = 20
    imgs = []
    ident = []
    for p in range(n_pairs):
        base = _rand_img(rng)
        imgs.append(Image.fromarray(base))
        if p % 2 == 0:  # same pair: near-identical second image
            imgs.append(Image.fromarray(
                np.clip(base.astype(int) + 2, 0, 255).astype(np.uint8)))
        else:
            imgs.append(Image.fromarray(_rand_img(rng)))
        ident.append(p % 2 == 0)

    def extract(arr):
        # downsample the image itself as the embedding
        return arr.reshape(arr.shape[0], -1)[:, ::200]

    dim = extract(np.zeros((1, 112, 112, 3), np.float32)).shape[1]
    rows = occlusion_sweep(imgs, ident, extract, no_occ=True,
                           batch_size=4, dim_feature=dim, verbose=False)
    assert len(rows) == 1
    assert rows[0]["avg_acc"] >= 0.9  # identical pairs must verify


def test_occlusion_sweep_nb_protocol_occludes_even_only():
    """NB protocol (qeval_mxnet.py:173-187): only even-indexed images (first
    of each pair) get the RandomBlock; odd-indexed stay clean."""
    from msml_tpu.data.rand_occ import RandomBlock
    from msml_tpu.eval.occ_sweep import _extract_occluded

    imgs = [Image.fromarray(np.full((112, 112, 3), 200, np.uint8))
            for _ in range(8)]

    def extract(arr):
        # mean intensity as a 1-d "feature": black occlusion lowers it
        return arr.reshape(arr.shape[0], -1).mean(axis=1, keepdims=True)

    rng = np.random.RandomState(0)
    block = RandomBlock(60, 61, fill="black")
    feats = _extract_occluded(imgs, block, extract, (112, 112), 4,
                              use_norm=False, is_gray=False, rng=rng,
                              dim_feature=1, protocol="NB")
    even, odd = feats[0::2, 0], feats[1::2, 0]
    clean = 2 * 200.0 / 255.0  # orig + flip passes of an untouched image
    np.testing.assert_allclose(odd, clean, atol=1e-5)
    assert (even < clean - 0.3).all()

    # BB occludes everything
    feats_bb = _extract_occluded(imgs, block, extract, (112, 112), 4,
                                 use_norm=False, is_gray=False, rng=rng,
                                 dim_feature=1, protocol="BB")
    assert (feats_bb[:, 0] < clean - 0.3).all()


def test_real_occ(tmp_path):
    """RealOcc paste pipeline: output contract + occlusion present."""
    from msml_tpu.tools.make_occluders import main as make_occluders
    from msml_tpu.data.real_occ import RealOcc

    make_occluders(str(tmp_path), num=4)
    trans = RealOcc(str(tmp_path / "object_train"))
    rng = np.random.RandomState(0)
    img = Image.fromarray(np.full((112, 112, 3), 180, np.uint8))
    occluded_any = False
    for i in range(5):
        out, msk = trans(img, rng)
        assert out.size == (112, 112)
        m = np.asarray(msk)
        assert set(np.unique(m)) <= {0, 255}
        occluded_any |= (m == 0).any()
    assert occluded_any


def test_real_occ_occlusion_area_distribution(tmp_path):
    """Distribution check: over many samples, the occluded-area fraction
    must be spread (the augment_occluder rescale targets
    sqrt(src_area/occ_area * U(0.5,1)) of the face box, then 0.75 padding),
    not degenerate at 0 or 1."""
    from msml_tpu.tools.make_occluders import main as make_occluders
    from msml_tpu.data.real_occ import RealOcc

    make_occluders(str(tmp_path), num=4)
    trans = RealOcc(str(tmp_path / "object_train"))
    rng = np.random.RandomState(1)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(112, 112, 3) * 255).astype(np.uint8))
    fracs = []
    for _ in range(40):
        _, msk = trans(img, rng)
        fracs.append(float((np.asarray(msk) == 0).mean()))
    fracs = np.asarray(fracs)
    assert fracs.mean() > 0.02, fracs.mean()   # occlusion actually happens
    assert fracs.max() < 0.95                  # face never fully erased
    assert fracs.std() > 0.02                  # sizes vary (not one constant)


def test_real_occ_random_shape_mode(tmp_path):
    """'rand'/DTD mode: bezier blob cut from a texture directory."""
    from msml_tpu.data.real_occ import RandomShapeOccluder, RealOcc

    tex_dir = tmp_path / "dtd"
    tex_dir.mkdir()
    rng = np.random.RandomState(2)
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            tex_dir / f"t{i}.jpg")
    gen = RandomShapeOccluder(str(tex_dir), mask_shape=128)
    occ, msk = gen.get_img_mask(rng)
    assert occ.ndim == 3 and msk.ndim == 2
    assert (msk == 255).any()
    trans = RealOcc(random_shape_textures=str(tex_dir))
    out, m = trans(Image.fromarray(np.full((112, 112, 3), 128, np.uint8)),
                   rng)
    assert out.size == (112, 112)
    assert set(np.unique(np.asarray(m))) <= {0, 255}


def test_colour_transfer_sot_moves_moments():
    """SOT colour transfer (colour_transfer.py:32-97): the transferred
    image's colour distribution must move to the target's (matching mean
    within a few units per channel), with regularization disabled for an
    exact distribution-matching check."""
    from msml_tpu.data.real_occ import color_transfer_sot

    rng = np.random.RandomState(3)
    src = rng.rand(24, 24, 3) * 0.3              # dark source
    trg = 0.6 + rng.rand(24, 24, 3) * 0.3        # bright target
    out = color_transfer_sot(src, trg, steps=25, batch_size=5,
                             reg_sigmaXY=0.0, rng=rng)
    # sliced OT converges to the target distribution: compare sorted values
    for ch in range(3):
        np.testing.assert_allclose(np.sort(out[..., ch], axis=None),
                                   np.sort(trg[..., ch], axis=None),
                                   atol=0.06)
    assert abs(out.mean() - trg.mean()) < 0.02


def test_colour_transfer_occluder_wrapper():
    """main.py:124-161 wrapper: recoloured occluder matches the face crop's
    brightness much more closely than the original occluder did."""
    from msml_tpu.data.real_occ import colour_transfer_occluder

    rng = np.random.RandomState(4)
    face = np.clip(rng.normal(170, 15, (48, 48, 3)), 0,
                   255).astype(np.uint8)
    occ = np.clip(rng.normal(40, 10, (32, 32, 3)), 0, 255).astype(np.uint8)
    out = colour_transfer_occluder(face, np.ones((48, 48), np.uint8), occ,
                                   (0, 0, 48, 48), rng=rng,
                                   steps=8, reg_sigmaXY=4.0, reg_sigmaV=3.0)
    assert out.dtype == np.uint8 and out.shape == occ.shape
    assert abs(float(out.mean()) - 170) < 40   # moved toward the face tone
    assert float(out.mean()) > occ.mean() + 60


def test_stack_windows_propagates_close():
    """Abandoning the prefetcher must release the dataset's resources even
    through the scan-window wrapper: closing _stack_windows has to close
    the wrapped epoch generator (whose finally shuts the worker pool)."""
    import numpy as np

    from msml_tpu.data.pipeline import _stack_windows
    closed = []

    def gen():
        try:
            for i in range(10):
                yield {"x": np.full(2, i)}
        finally:
            closed.append(True)

    w = _stack_windows(gen(), 2)
    next(w)
    w.close()
    assert closed == [True]
