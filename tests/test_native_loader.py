"""Native data loader (tools_cpp/msml_loader.cpp): recordio parsing, batch
decode parity vs the Python cv2 path, labels, resize, and error handling."""

import os

import numpy as np
import pytest

from msml_tpu.data import native_loader
from msml_tpu.data.recordio import (IRHeader, IndexedRecordIO, imdecode,
                                    imencode, pack, unpack)

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason="native loader not built (python -m msml_tpu.tools.native --build)")


@pytest.fixture(scope="module")
def rec(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_rec"))
    rng = np.random.RandomState(7)
    idx_p = os.path.join(root, "train.idx")
    rec_p = os.path.join(root, "train.rec")
    w = IndexedRecordIO(idx_p, rec_p, "w")
    # key 0: header record with extended label, like insightface train.rec
    w.write_idx(0, pack(IRHeader(2, [33.0, 8.0], 1, 0), b""))
    imgs = {}
    for i in range(1, 33):
        shape = (112, 112) if i % 3 else (100, 90)  # mixed sizes
        img = (rng.rand(*shape, 3) * 255).astype(np.uint8)
        w.write_idx(i, pack(IRHeader(0, float(i % 8), 0, 0), imencode(img)))
        imgs[i] = img
    w.close()
    return idx_p, rec_p, imgs


def test_keys_and_labels(rec):
    idx_p, rec_p, _ = rec
    with native_loader.NativeRecordReader(idx_p, rec_p) as r:
        assert r.keys.tolist() == list(range(33))
        _, labels = r.decode_batch([1, 2, 9], (112, 112))
        np.testing.assert_array_equal(labels, [1.0, 2.0, 1.0])
        # header record (flag > 0): label = first extended float
        _, lab0 = r.decode_batch([0], (112, 112), strict=False)
        assert lab0[0] == 33.0


def test_decode_bit_parity_with_cv2(rec):
    """libjpeg (islow + fancy upsampling) must match recordio.imdecode
    (cv2 / libjpeg-turbo) bit-for-bit — the parity contract for training
    pixels."""
    idx_p, rec_p, _ = rec
    py = IndexedRecordIO(idx_p, rec_p)
    with native_loader.NativeRecordReader(idx_p, rec_p, nthreads=4) as r:
        keys = [i for i in range(1, 33) if i % 3]  # the 112x112 records
        imgs, _ = r.decode_batch(keys, (112, 112))
        for k, got in zip(keys, imgs):
            _, raw = unpack(py.read_idx(k))
            ref = imdecode(raw)
            np.testing.assert_array_equal(got, ref, err_msg=f"key {k}")


def test_decode_jpeg_helper_parity(rec):
    idx_p, rec_p, _ = rec
    py = IndexedRecordIO(idx_p, rec_p)
    _, raw = unpack(py.read_idx(4))
    got = native_loader.decode_jpeg(raw)
    np.testing.assert_array_equal(got, imdecode(raw))
    assert native_loader.decode_jpeg(b"not a jpeg") is None


def test_grayscale_jpeg_expands_to_rgb(tmp_path):
    import cv2
    g = (np.arange(112 * 112, dtype=np.uint8).reshape(112, 112) % 251)
    ok, buf = cv2.imencode(".jpg", g)
    assert ok
    got = native_loader.decode_jpeg(buf.tobytes())
    ref = imdecode(buf.tobytes())  # cv2 IMREAD_COLOR replicates channels
    np.testing.assert_array_equal(got, ref)


def test_resize_path(rec):
    """Non-112 records resize bilinearly (half-pixel, cv2 convention)."""
    import cv2
    idx_p, rec_p, imgs = rec
    py = IndexedRecordIO(idx_p, rec_p)
    with native_loader.NativeRecordReader(idx_p, rec_p) as r:
        keys = [i for i in range(1, 33) if i % 3 == 0]  # 100x90 records
        got, _ = r.decode_batch(keys, (112, 112))
        for k, g in zip(keys, got):
            _, raw = unpack(py.read_idx(k))
            ref = cv2.resize(imdecode(raw), (112, 112),
                             interpolation=cv2.INTER_LINEAR)
            # cv2 uses fixed-point bilinear; allow 1-lsb rounding skew
            assert np.abs(g.astype(int) - ref.astype(int)).max() <= 1

def test_missing_and_corrupt_records(rec, tmp_path):
    idx_p, rec_p, _ = rec
    with native_loader.NativeRecordReader(idx_p, rec_p) as r:
        with pytest.raises(IOError):
            r.decode_batch([999], (112, 112))
        imgs, labels = r.decode_batch([999, 5], (112, 112), strict=False)
        assert imgs[0].max() == 0  # failed slot zero-filled
        assert labels[1] == 5.0 and imgs[1].max() > 0
    with pytest.raises(FileNotFoundError):
        native_loader.NativeRecordReader(str(tmp_path / "no.idx"),
                                         str(tmp_path / "no.rec"))


def test_thread_counts_agree(rec):
    idx_p, rec_p, _ = rec
    keys = list(range(1, 33))
    with native_loader.NativeRecordReader(idx_p, rec_p, nthreads=1) as r1, \
         native_loader.NativeRecordReader(idx_p, rec_p, nthreads=8) as r8:
        a, la = r1.decode_batch(keys, (112, 112))
        b, lb = r8.decode_batch(keys, (112, 112))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)


def test_mxfacedataset_native_epoch_exact(tmp_path):
    """MXFaceDataset native batch path == Python path, bit-for-bit, across
    epochs (decode parity + identical per-sample flip RNG), RGB and gray."""
    from msml_tpu.data.face_dataset import MXFaceDataset
    from msml_tpu.data.recordio import IRHeader, IndexedRecordIO, imencode, pack

    root = str(tmp_path / "rec")
    os.makedirs(root)
    rng = np.random.RandomState(3)
    w = IndexedRecordIO(os.path.join(root, "train.idx"),
                        os.path.join(root, "train.rec"), "w")
    w.write_idx(0, pack(IRHeader(2, [65.0, 4.0], 1, 0), b""))
    for i in range(1, 65):
        img = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
        w.write_idx(i, pack(IRHeader(0, float(i % 4), 0, 0), imencode(img)))
    w.close()

    for gray in (False, True):
        a = MXFaceDataset(root, batch_size=16, native_decode=True,
                          is_gray=gray, use_ori=True)
        b = MXFaceDataset(root, batch_size=16, native_decode=False,
                          is_gray=gray, use_ori=True)
        assert a._native is not None
        for ep in (0, 1):
            for ba, bb in zip(a.epoch(ep), b.epoch(ep)):
                assert set(ba) == set(bb)
                for k in ba:
                    np.testing.assert_array_equal(
                        ba[k], np.asarray(bb[k]),
                        err_msg=f"gray={gray} ep={ep} {k}")
        a.close(), b.close()


def test_mxfacedataset_native_falls_back_on_size_mismatch(tmp_path):
    """Recs not at out_size must keep the Python path (PIL-resize parity)."""
    from msml_tpu.data.face_dataset import MXFaceDataset
    from msml_tpu.data.recordio import IRHeader, IndexedRecordIO, imencode, pack

    root = str(tmp_path / "rec96")
    os.makedirs(root)
    w = IndexedRecordIO(os.path.join(root, "train.idx"),
                        os.path.join(root, "train.rec"), "w")
    img = (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(np.uint8)
    for i in range(4):
        w.write_idx(i, pack(IRHeader(0, float(i), 0, 0), imencode(img)))
    w.close()
    ds = MXFaceDataset(root, batch_size=2)  # auto mode
    assert ds._native is None
    with pytest.raises(RuntimeError):
        MXFaceDataset(root, batch_size=2, native_decode=True)


def test_mxfacedataset_native_raw_uint8(tmp_path):
    """device_light mode through the native loader: raw_uint8=True yields
    uint8 batches equal to the float path pushed through /255 + normalize,
    RGB and gray."""
    from msml_tpu.data.face_dataset import MXFaceDataset
    from msml_tpu.data.recordio import IRHeader, IndexedRecordIO, imencode, pack

    root = str(tmp_path / "rec_u8")
    os.makedirs(root)
    rng = np.random.RandomState(5)
    w = IndexedRecordIO(os.path.join(root, "train.idx"),
                        os.path.join(root, "train.rec"), "w")
    w.write_idx(0, pack(IRHeader(2, [17.0, 4.0], 1, 0), b""))
    for i in range(1, 17):
        img = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
        w.write_idx(i, pack(IRHeader(0, float(i % 4), 0, 0), imencode(img)))
    w.close()

    for gray in (False, True):
        a = MXFaceDataset(root, batch_size=8, native_decode=True,
                          is_gray=gray, raw_uint8=True)
        b = MXFaceDataset(root, batch_size=8, native_decode=True,
                          is_gray=gray)
        assert a._native is not None and b._native is not None
        for ba, bb in zip(a.epoch(0), b.epoch(0)):
            assert ba["img"].dtype == np.uint8
            np.testing.assert_array_equal(
                (ba["img"].astype(np.float32) / 255.0 - 0.5) / 0.5,
                bb["img"], err_msg=f"gray={gray}")
            np.testing.assert_array_equal(ba["label"], bb["label"])
        a.close(), b.close()


def test_decode_batch_exact_reports_offsize(rec):
    """exact=True: off-size records come back in bad_keys (zero-filled),
    not silently cv2-resized; exact=False keeps the v1 resize behavior."""
    idx_p, rec_p, imgs = rec
    with native_loader.NativeRecordReader(idx_p, rec_p) as r:
        keys = [1, 2, 3]  # 1, 2 are 100x90; 3 is 112x112 (i % 3 pattern)
        offsize = [k for k in keys if imgs[k].shape[:2] != (112, 112)]
        exact_imgs, labels, bad = r.decode_batch_partial(keys, (112, 112),
                                                         exact=True)
        assert sorted(bad.tolist()) == sorted(offsize)
        np.testing.assert_array_equal(labels, [1.0, 2.0, 3.0])
        rd = IndexedRecordIO(idx_p, rec_p, "r")
        for j, k in enumerate(keys):
            if k in offsize:
                assert exact_imgs[j].max() == 0  # zero-filled, not resized
            else:
                _, raw = unpack(rd.read_idx(k))
                np.testing.assert_array_equal(exact_imgs[j], imdecode(raw))
        rd.close()
        # exact=False == the v1 contract: everything decodes, no bad keys
        _, _, bad2 = r.decode_batch_partial(keys, (112, 112), exact=False)
        assert bad2.size == 0


def test_mxfacedataset_native_mixed_sizes_past_probe(tmp_path):
    """A rec whose FIRST record is at out_size but that contains off-size
    records must still match the Python path bit-for-bit: the off-size
    records are detected per batch and PIL-decoded (the init probe alone
    can't see them)."""
    from msml_tpu.data.face_dataset import MXFaceDataset
    from msml_tpu.data.recordio import IRHeader, IndexedRecordIO, imencode, pack

    root = str(tmp_path / "rec_mixed")
    os.makedirs(root)
    rng = np.random.RandomState(11)
    w = IndexedRecordIO(os.path.join(root, "train.idx"),
                        os.path.join(root, "train.rec"), "w")
    w.write_idx(0, pack(IRHeader(2, [17.0, 4.0], 1, 0), b""))
    for i in range(1, 17):
        shape = (112, 112) if i % 4 else (96, 100)  # probe sees 112x112
        img = (rng.rand(*shape, 3) * 255).astype(np.uint8)
        w.write_idx(i, pack(IRHeader(0, float(i % 4), 0, 0), imencode(img)))
    w.close()

    a = MXFaceDataset(root, batch_size=8, native_decode=True, use_ori=True)
    b = MXFaceDataset(root, batch_size=8, native_decode=False, use_ori=True)
    assert a._native is not None
    n_batches = 0
    for ba, bb in zip(a.epoch(0), b.epoch(0)):
        for k in ba:
            np.testing.assert_array_equal(ba[k], np.asarray(bb[k]),
                                          err_msg=k)
        n_batches += 1
    assert n_batches == 2
    a.close(), b.close()
