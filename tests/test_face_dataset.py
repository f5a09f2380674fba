"""FaceByRandOccMask end-to-end: tiny rec dataset + procedural occluders."""

import os

import numpy as np
import pytest

from msml_tpu.data.face_dataset import FaceByRandOccMask, gauss_map
from msml_tpu.data.recordio import IRHeader, IndexedRecordIO, imencode, pack
from msml_tpu.tools.make_occluders import main as make_occluders


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("casia_rec"))
    occl = str(tmp_path_factory.mktemp("occluders"))
    make_occluders(occl, num=2)
    rng = np.random.RandomState(0)

    def smooth(size=112):
        from PIL import Image
        small = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
        return np.asarray(Image.fromarray(small).resize((size, size)))

    n, n_cls = 12, 3
    rec = IndexedRecordIO(os.path.join(root, "train.idx"),
                          os.path.join(root, "train.rec"), "w")
    rec.write_idx(0, pack(IRHeader(2, [n + 1, n_cls], 1, 0), b""))
    mo = IndexedRecordIO(os.path.join(root, "mask_out.idx"),
                         os.path.join(root, "mask_out.rec"), "w")
    mk = IndexedRecordIO(os.path.join(root, "mask.idx"),
                         os.path.join(root, "mask.rec"), "w")
    for i in range(1, n + 1):
        img = smooth()
        rec.write_idx(i, pack(IRHeader(0, float(i % n_cls), 0, 0),
                              imencode(img)))
        masked = img.copy()
        masked[60:, :] = 30  # fake 3D mask on lower face
        mo.write_idx(i, pack(IRHeader(0, float(i % n_cls), 0, 0),
                             imencode(masked)))
        m = np.full((112, 112, 3), 255, np.uint8)
        m[60:, :] = 0
        mk.write_idx(i, pack(IRHeader(0, 0.0, 0, 0), imencode(m)))
    rec.close(), mo.close(), mk.close()
    return root, occl


def test_getitem_contract(tiny_dataset):
    root, occl = tiny_dataset
    ds = FaceByRandOccMask(root, out_size=(112, 112), use_norm=True,
                           occluder_root=occl, batch_size=4, seed=0)
    assert len(ds) == 12
    r = np.random.RandomState(0)
    img, msk, ori, label = ds.__getitem__(0, r)
    assert img.shape == (112, 112, 3) and img.dtype == np.float32
    assert msk.shape == (112, 112) and set(np.unique(msk)) <= {0, 1}
    assert ori.shape == (112, 112, 3)
    assert 0 <= int(label) < 3
    assert img.min() >= -1.5 and img.max() <= 1.5


def test_epoch_batches(tiny_dataset):
    root, occl = tiny_dataset
    ds = FaceByRandOccMask(root, out_size=(112, 112), use_norm=True,
                           occluder_root=occl, batch_size=4, seed=0,
                           num_workers=2)
    batches = list(ds.epoch(0))
    assert len(batches) == 3  # drop_last
    b = batches[0]
    assert b["img"].shape == (4, 112, 112, 3)
    assert b["msk"].shape == (4, 112, 112)
    assert b["ori"].shape == (4, 112, 112, 3)
    assert b["label"].shape == (4,)
    # determinism: same epoch twice -> identical batches
    b2 = next(iter(ds.epoch(0)))
    np.testing.assert_array_equal(b["img"], b2["img"])
    # different epoch -> different
    b3 = next(iter(ds.epoch(1)))
    assert not np.array_equal(b["img"], b3["img"])


def test_mask_branch_probability(tiny_dataset):
    """P(3D mask) = 2/10 (load_dataset.py:113): with the mask recs present,
    some samples must come from the mask branch (lower face black)."""
    root, occl = tiny_dataset
    ds = FaceByRandOccMask(root, out_size=(112, 112), use_norm=False,
                           occluder_root=occl, seed=0)
    n_mask = 0
    for i in range(60):
        r = np.random.RandomState(1000 + i)
        img, msk, ori, label = ds.__getitem__(i % 12, r)
        # mask branch: lower-face occluded in the GT mask
        if msk[80:, :].mean() < 0.1 and msk[:40, :].mean() > 0.9:
            n_mask += 1
    assert 2 <= n_mask <= 30  # ~2/10 of 60 = 12, loose bounds


def test_gray_mode(tiny_dataset):
    root, occl = tiny_dataset
    ds = FaceByRandOccMask(root, out_size=(128, 128), is_gray=True,
                           use_norm=False, occluder_root=occl)
    r = np.random.RandomState(0)
    img, msk, ori, label = ds.__getitem__(0, r)
    assert img.shape == (128, 128, 1)
    assert ori.shape == (128, 128, 1)
    assert msk.shape == (128, 128)


def test_gauss_map_range():
    r = np.random.RandomState(0)
    g = gauss_map(0, 0, 112, 112, r, radius=128)
    assert g.shape == (112, 112)
    assert 0 < g.min() and g.max() <= 1.0


@pytest.mark.slow
def test_epoch_multiprocess_matches_threads(tiny_dataset):
    """Process-pool loading yields byte-identical batches to the thread
    path (deterministic per-sample RNG), exercising RecordIO fork safety."""
    root, occl = tiny_dataset
    ds = FaceByRandOccMask(root, out_size=(112, 112), use_norm=True,
                           occluder_root=occl, batch_size=4, seed=0,
                           num_workers=2)
    b_threads = next(iter(ds.epoch(0)))
    try:
        b_procs = next(iter(ds.epoch(0, use_processes=True)))
    finally:
        ds.close()
    for k in b_threads:
        np.testing.assert_array_equal(b_threads[k], b_procs[k])


def test_recordio_thread_hammer(tiny_dataset):
    """Many threads reading concurrently must never corrupt reads
    (regression: shared-handle seek+read race)."""
    from concurrent.futures import ThreadPoolExecutor
    from msml_tpu.data.recordio import unpack
    root, _ = tiny_dataset
    rec = IndexedRecordIO(os.path.join(root, "train.idx"),
                          os.path.join(root, "train.rec"))
    want = {k: rec.read_idx(k) for k in rec.keys}

    def read_many(seed):
        rng = np.random.RandomState(seed)
        for _ in range(200):
            k = rec.keys[rng.randint(len(rec.keys))]
            payload = rec.read_idx(k)
            assert payload == want[k]
        return True

    with ThreadPoolExecutor(max_workers=8) as ex:
        assert all(ex.map(read_many, range(8)))


def test_shard_padding_equal_batches(tiny_dataset):
    """DistributedSampler-style wrap-around padding: when len(dataset) is
    not a multiple of num_shards, every rank must still see the same
    number of samples (and therefore launch the same number of pod-wide
    SPMD programs per epoch — a mismatch hangs a real pod at the epoch
    boundary)."""
    root, occl = tiny_dataset
    num_shards = 5  # 12 % 5 == 2 -> unpadded shards would be 3,3,2,2,2
    counts, seen = [], []
    for sid in range(num_shards):
        ds = FaceByRandOccMask(root, out_size=(112, 112), use_norm=True,
                               occluder_root=occl, batch_size=3, seed=0,
                               num_workers=1, shard_id=sid,
                               num_shards=num_shards)
        batches = list(ds.epoch(0))
        counts.append(len(batches))
        seen.append(np.concatenate([b["label"] for b in batches]))
    # equal batch count on every rank (the actual pod-hang regression)
    assert counts == [1] * num_shards
    # total samples across ranks = padded length (ceil(12/5)*5)
    assert sum(s.size for s in seen) == 15


def test_shard_padding_more_shards_than_samples(tiny_dataset):
    """Degenerate pad > len(dataset): padding must tile the order
    cyclically (DistributedSampler repeats indices), not silently leave
    some ranks short."""
    root, occl = tiny_dataset
    num_shards = 25  # 12 samples -> pad 13 > len(order)
    sizes = []
    for sid in range(num_shards):
        ds = FaceByRandOccMask(root, out_size=(112, 112), use_norm=True,
                               occluder_root=occl, batch_size=1, seed=0,
                               num_workers=1, shard_id=sid,
                               num_shards=num_shards)
        sizes.append(len(list(ds.epoch(0))))
    assert sizes == [1] * num_shards


def test_mxfacedataset_plain_reader(tiny_dataset):
    """MXFaceDataset = reference load_dataset.py:344-396: resize/flip/
    normalize ONLY. No Gaussian relighting — every pixel must be an exact
    (k/255 - 0.5)/0.5 grid value (relighting rescales + /max-renormalizes,
    which destroys the grid)."""
    from msml_tpu.data.face_dataset import MXFaceDataset
    root, occl = tiny_dataset
    ds = MXFaceDataset(root, out_size=(112, 112), occluder_root=occl,
                       num_workers=1)
    r = np.random.RandomState(3)
    img, msk, ori, label = ds.__getitem__(0, r)
    levels = (img * 0.5 + 0.5) * 255.0
    np.testing.assert_allclose(levels, np.round(levels), atol=1e-3)
    assert msk.min() == 1          # all-clean mask
    np.testing.assert_array_equal(ori, img)


def test_use_ori_false_skips_ori_and_epoch_drops_it(tiny_dataset):
    root, occl = tiny_dataset
    ds = FaceByRandOccMask(root, out_size=(112, 112), use_norm=True,
                           occluder_root=occl, batch_size=4, seed=0,
                           num_workers=1, use_ori=False)
    r = np.random.RandomState(5)
    img, msk, ori, label = ds.__getitem__(0, r)
    np.testing.assert_array_equal(ori, img)     # placeholder alias
    b = next(iter(ds.epoch(0)))
    assert "ori" not in b and b["img"].shape == (4, 112, 112, 3)


def test_synthetic_mask_polarity():
    """Synthetic batches must use the real pipeline's polarity: 1 = clean,
    0 = occluded (a mostly-ones mask with occluded rectangles)."""
    from msml_tpu.data.synthetic import synthetic_batch
    b = synthetic_batch(16, size=32, seed=0)
    msk = b["msk"]
    assert set(np.unique(msk)) <= {0, 1}
    # clean pixels dominate: occlusions are rectangles <= 1/4 of the image
    assert (msk == 1).mean() > 0.5
    assert (msk == 0).any()                     # some occlusion exists
