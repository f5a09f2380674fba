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


def _import_ref_get_list():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_get_list", "/root/reference/datasets/benchmarks/get_list.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_write_lists_ar_matches_reference(tmp_path):
    """get_filelist_ar called directly (its start_generate_list dispatcher
    is broken in the reference: 10 args to a 9-param function)."""
    import random

    import pytest
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo absent")
    gl = _import_ref_get_list()

    root = str(tmp_path / "AR")
    img_dir = os.path.join(root, "AR-pre", "input")
    os.makedirs(img_dir)
    for name in ("m-001-1.bmp", "m-014-2.bmp", "w-003-1.bmp",
                 "w-050-9.bmp"):
        open(os.path.join(img_dir, name), "wb").close()

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    names = ["relative.list", "full.list", "train.list", "val.list",
             "train_full.list", "val_full.list", "ver.list"]
    random.seed(7)
    handles = [open(ref_out / n, "w") for n in names]
    gl.get_filelist_ar(root, os.path.join(img_dir, ""), *handles)
    for h in handles:
        h.close()

    our_out = tmp_path / "ours"
    from msml_tpu.tools.make_lists import write_lists_ar
    random.seed(7)
    counts = write_lists_ar(root, img_dir, str(our_out))
    assert counts["labels"] == 40  # 4 imgs x 10 repeats

    for ref_name, our_name in (("relative.list", "relative.list"),
                               ("train.list", "train.list"),
                               ("val.list", "val.list"),
                               ("train_full.list", "train_full.list"),
                               ("val_full.list", "val_full.list")):
        ref = (ref_out / ref_name).read_text()
        ours = (our_out / our_name).read_text()
        assert ref == ours, (ref_name, ref[:200], ours[:200])
    # label parsing: w-050 -> 100, m-001 -> 1
    rel = (our_out / "relative.list").read_text()
    assert " 100 " in rel and " 1 " in rel


def test_write_lists_mega_matches_reference(tmp_path):
    import pytest
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo absent")
    gl = _import_ref_get_list()

    root = str(tmp_path / "Mega")
    for sub in ("a/b", "c"):
        d = os.path.join(root, "megaface_images", sub)
        os.makedirs(d)
        for i in range(3):
            open(os.path.join(d, f"d{i}.jpg"), "wb").close()
        open(os.path.join(d, "d0.jpg.json"), "wb").close()  # skipped
    for ident in ("Adam", "Beth"):
        d = os.path.join(root, "facescrub_images", ident)
        os.makedirs(d)
        for i in range(3):
            open(os.path.join(d, f"{ident}{i}.jpg"), "wb").close()

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    names = ["relative.list", "full.list", "distractor.list", "probe.list",
             "distractor_full.list", "probe_full.list", "ver.list"]
    handles = [open(ref_out / n, "w") for n in names]
    gl.get_filelist_mega(root, "", *handles)
    for h in handles:
        h.close()

    from msml_tpu.tools.make_lists import write_lists_mega
    our_out = tmp_path / "ours"
    counts = write_lists_mega(root, str(our_out))
    assert counts == {"distractor": 6, "probe": 12, "identities": 2}

    for ref_name, our_name in (("relative.list", "relative.list"),
                               ("distractor.list", "distractor.list"),
                               ("probe.list", "probe.list")):
        ref = (ref_out / ref_name).read_text()
        ours = (our_out / our_name).read_text()
        assert ref == ours, (ref_name, ref[:300], ours[:300])
