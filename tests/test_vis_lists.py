"""Observability + list-generation tool tests."""

import os

import numpy as np

from msml_tpu.core.vis import (plot_fm_features, plot_tensor,
                               save_training_snapshot)
from msml_tpu.tools.make_lists import scan_identities, write_lists


def test_plot_tensor(tmp_path):
    out = plot_tensor([np.random.rand(8, 8), np.random.rand(4, 16)],
                      ["a", "b"], str(tmp_path / "t.jpg"))
    if out is not None:  # matplotlib present
        assert os.path.exists(out)


def test_training_snapshot(tmp_path):
    rng = np.random.RandomState(0)
    save_training_snapshot(str(tmp_path), 10,
                           rng.uniform(-1, 1, (112, 112, 3)),
                           rng.rand(112, 112, 2),
                           (rng.rand(112, 112) > 0.5).astype(np.int32))
    snap = tmp_path / "snapshot"
    assert (snap / "10_face.jpg").exists()
    assert (snap / "10_seg.jpg").exists()
    assert (snap / "10_gt_occ.jpg").exists()


def test_plot_fm_features(tmp_path):
    rng = np.random.RandomState(0)
    n = 64
    plot_fm_features(rng.randn(n), rng.rand(n), rng.randn(n),
                     (rng.rand(n) > 0.5).astype(int), str(tmp_path), "t")
    # files exist only if matplotlib present; no crash either way


def _folder(tmp_path, pku_style=False):
    from PIL import Image
    rng = np.random.RandomState(0)
    for ident in ("007", "008", "009"):
        dirs = [f"{ident}_0", f"{ident}_1"] if pku_style else [ident]
        for d in dirs:
            p = tmp_path / d
            p.mkdir(parents=True, exist_ok=True)
            for i in range(3):
                img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(p / f"{i}.png")
    return str(tmp_path)


def test_scan_identities_pku_collapse(tmp_path):
    root = _folder(tmp_path, pku_style=True)
    ids = scan_identities(root)
    assert set(ids) == {"007", "008", "009"}
    assert all(len(v) == 6 for v in ids.values())


def test_write_lists(tmp_path):
    root = _folder(tmp_path / "data")
    out = str(tmp_path / "lists")
    counts = write_lists(root, out, val_every=3, n_pairs=10)
    assert counts["train"] + counts["val"] == 9
    assert counts["pos"] + counts["neg"] == 10
    with open(os.path.join(out, "list.txt")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 9
    path, label = lines[0].rsplit(" ", 1)
    assert int(label) == 0
    with open(os.path.join(out, "ver_pairs.txt")) as f:
        assert len(f.read().strip().splitlines()) == 20
    # pairs.txt consumable by folder_eval.load_folder_pairs
    from msml_tpu.eval.folder_eval import load_folder_pairs
    imgs, labels = load_folder_pairs(root, os.path.join(out, "pairs.txt"))
    assert len(imgs) == 20
