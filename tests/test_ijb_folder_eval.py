"""IJB template-verification and folder-eval protocol tests."""

import os

import numpy as np
import pytest
from PIL import Image

from msml_tpu.eval.ijb import (extract_ijb_features, image2template_feature,
                               lmk68_to_5, prepare_image_feats,
                               read_template_media_list,
                               read_template_pair_list, run_ijb_protocol,
                               tpr_at_fpr_table, verification_scores)
from msml_tpu.eval.folder_eval import evaluate_folder, load_folder_pairs
from msml_tpu.eval.verification import l2_normalize_np


def test_media_aggregation_semantics():
    """qeval_ijbc.py:303-337: same-media features mean-pooled, medias summed,
    templates normalized."""
    feats = np.array([[1.0, 0], [3.0, 0], [0, 2.0], [5.0, 5.0]])
    templates = np.array([7, 7, 7, 9])
    medias = np.array([1, 1, 2, 4])
    tfeats, uniq = image2template_feature(feats, templates, medias)
    np.testing.assert_array_equal(uniq, [7, 9])
    # template 7: mean([1,3]) = [2,0] plus media [0,2] -> [2,2] -> normalized
    np.testing.assert_allclose(tfeats[0], [2 / np.sqrt(8), 2 / np.sqrt(8)],
                               rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(tfeats, axis=1), 1.0,
                               rtol=1e-6)


def test_verification_scores_pairs():
    tfeats = l2_normalize_np(np.array([[1.0, 0], [0, 1.0], [1.0, 1.0]]))
    uniq = np.array([10, 20, 30])
    p1 = np.array([10, 10])
    p2 = np.array([20, 30])
    s = verification_scores(tfeats, uniq, p1, p2)
    np.testing.assert_allclose(s, [0.0, 1 / np.sqrt(2)], atol=1e-6)


def test_full_ijb_protocol_separable():
    rng = np.random.RandomState(0)
    n_id = 10
    id_feats = l2_normalize_np(rng.randn(n_id, 64))
    # 4 images per template, 2 templates per identity
    feats, templates, medias = [], [], []
    tid = 0
    for i in range(n_id):
        for _ in range(2):
            for k in range(4):
                feats.append(np.concatenate(
                    [id_feats[i] + 0.05 * rng.randn(64)] * 2))  # orig+flip
                templates.append(tid)
                medias.append(k % 2)
            tid += 1
    feats = np.asarray(feats)
    templates = np.asarray(templates)
    medias = np.asarray(medias)
    # pairs: same-identity templates positive, cross negative
    p1, p2, label = [], [], []
    for i in range(n_id):
        p1.append(2 * i); p2.append(2 * i + 1); label.append(1)
        p1.append(2 * i); p2.append((2 * i + 2) % (2 * n_id)); label.append(0)
    table, score = run_ijb_protocol(feats, None, templates, medias,
                                    np.asarray(p1), np.asarray(p2),
                                    np.asarray(label),
                                    use_detector_score=False)
    assert table[1e-1] == 1.0  # fully separable at fpr 0.1


def test_save_roc_artifacts(tmp_path):
    """ROC pdf + TPR@FPR csv + raw scores written (qeval_ijbc.py:544-596)."""
    from msml_tpu.eval.ijb import save_roc_artifacts, tpr_at_fpr_table

    rng = np.random.RandomState(1)
    n = 400
    label = (rng.rand(n) > 0.5).astype(int)
    score = label + 0.3 * rng.randn(n)
    paths = save_roc_artifacts(str(tmp_path), "IJBC", label, score,
                               method="test")
    assert os.path.exists(paths["pdf"]) and os.path.getsize(paths["pdf"]) > 0
    np.testing.assert_allclose(np.load(paths["npy"]), score)
    with open(paths["csv"]) as f:
        header, row = f.read().strip().split("\n")
    assert header.split(",")[1:] == ["1e-06", "1e-05", "0.0001", "0.001",
                                     "0.01", "0.1"]
    cells = row.split(",")
    assert cells[0] == "test-IJBC"
    table = tpr_at_fpr_table(label, score)
    for cell, x in zip(cells[1:], (1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1)):
        assert abs(float(cell) - table[x] * 100) < 0.005


def test_lmk68_to_5():
    lmk = np.arange(136, dtype=np.float32).reshape(68, 2)
    out = lmk68_to_5(lmk)
    np.testing.assert_allclose(out[0], (lmk[36] + lmk[39]) / 2)
    np.testing.assert_allclose(out[2], lmk[30])


def test_metadata_readers(tmp_path):
    meta = tmp_path / "tid_mid.txt"
    meta.write_text("img1.jpg 1 100\nimg2.jpg 1 100\nimg3.jpg 2 200\n")
    t, m = read_template_media_list(str(meta))
    np.testing.assert_array_equal(t, [1, 1, 2])
    np.testing.assert_array_equal(m, [100, 100, 200])
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("1 2 1\n1 3 0\n")
    p1, p2, lab = read_template_pair_list(str(pairs))
    np.testing.assert_array_equal(lab, [1, 0])


def test_prepare_image_feats_flip_add_and_detector():
    feats = np.array([[1.0, 2.0, 3.0, 4.0]])
    out = prepare_image_feats(feats, np.array([0.5]), use_flip_test=True,
                              use_norm_score=True, use_detector_score=True)
    np.testing.assert_allclose(out, [[0.5 * 4.0, 0.5 * 6.0]])


@pytest.fixture()
def folder_dataset(tmp_path):
    rng = np.random.RandomState(0)
    ids = {}
    for name in ("alice", "bob"):
        d = tmp_path / "data" / name
        d.mkdir(parents=True)
        base = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
        ids[name] = base
        for i in range(2):
            img = np.clip(base.astype(int) + i, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i + 1:04d}.jpg")
    pair_txt = tmp_path / "pairs.txt"
    pair_txt.write_text("alice 1 2\nbob 1 2\nalice 1 bob 1\nbob 2 alice 2\n")
    return str(tmp_path / "data"), str(pair_txt)


def test_load_folder_pairs(folder_dataset):
    folder, pair_txt = folder_dataset
    imgs, labels = load_folder_pairs(folder, pair_txt)
    assert len(imgs) == 8
    np.testing.assert_array_equal(labels, [0, 0, 1, 1])


def test_evaluate_folder_end_to_end(folder_dataset):
    folder, pair_txt = folder_dataset

    def extract(arr):
        return arr.reshape(arr.shape[0], -1)[:, ::500]

    dim = extract(np.zeros((1, 112, 112, 3), np.float32)).shape[1]
    acc, tarfar = evaluate_folder(folder, pair_txt, extract,
                                  batch_size=4, dim_feature=dim)
    assert acc == 1.0  # same pairs are near-identical images
    assert tarfar.shape == (3,)


def test_aligned_crops_lazy_slicing(tmp_path):
    """cli.eval_ijb streams crops per batch (one batch resident — the
    reference's dataloader behavior) instead of materialising all of
    IJB-C as f32; slices align on demand and missing files name the
    offender."""
    import cv2
    import pytest

    from msml_tpu.cli.eval_ijb import AlignedCrops
    names, lmks = [], []
    rng = np.random.RandomState(0)
    base = np.float32([[38.3, 51.7], [73.5, 51.5], [56.0, 71.7],
                       [41.5, 92.4], [70.7, 92.2]])
    for i in range(5):
        name = f"im{i}.png"
        cv2.imwrite(str(tmp_path / name),
                    rng.randint(0, 255, (112, 112, 3), np.uint8))
        names.append(name)
        lmks.append(base + rng.randn(5, 2).astype(np.float32))
    crops = AlignedCrops(str(tmp_path), names, lmks)
    assert len(crops) == 5
    batch = crops[1:4]
    assert batch.shape == (3, 112, 112, 3) and batch.dtype == np.float32
    np.testing.assert_array_equal(crops[2], batch[1])  # single-index form
    crops.names[0] = "missing.png"
    with pytest.raises(FileNotFoundError, match="missing.png"):
        crops[0:2]


def test_run_ijb_protocol_skip_table():
    """compute_table=False skips the ROC sweep but returns identical
    scores (the repeat loop only tables the averaged scores)."""
    from msml_tpu.eval.ijb import run_ijb_protocol
    rng = np.random.RandomState(1)
    n = 24
    feats = rng.randn(n, 16).astype(np.float32)
    templates = np.repeat(np.arange(8), 3)
    medias = np.tile(np.arange(3), 8)
    p1 = np.arange(4)
    p2 = np.arange(4, 8)
    label = np.array([1, 0, 1, 0])
    t1, s1 = run_ijb_protocol(feats, None, templates, medias, p1, p2, label,
                              use_detector_score=False)
    t0, s0 = run_ijb_protocol(feats, None, templates, medias, p1, p2, label,
                              compute_table=False, use_detector_score=False)
    assert t0 is None and t1 is not None
    np.testing.assert_array_equal(s0, s1)
