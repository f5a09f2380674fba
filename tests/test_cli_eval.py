"""End-to-end eval CLI drives: cli.train produces a weight folder, then
cli.test (clean LFW-style protocol) and cli.eval_ijb (template protocol
over a synthetic IJB root) consume it through the shared
core/weight_folder restore path — the same chain a user runs."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def weight_folder(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wf")
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs",
                                           "arc18_msml.yaml")))
    cfg.update(dataset="synthetic", rec="", batch_size=4, num_classes=8,
               use_osb=False, fm_layers=[0, 0, 0, 0],
               out_folder=str(tmp / "out"))
    cfg_path = tmp / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "msml_tpu.cli.train", "--config",
         str(cfg_path), "--steps", "1", "--platform", "cpu",
         "--cpu-devices", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    return str(tmp / "out" / "arc18_msml_1")


def _write_bin(path, n_pairs=20, seed=0):
    from msml_tpu.data.recordio import imencode
    rng = np.random.RandomState(seed)
    bins, issame = [], []
    for p in range(n_pairs):
        a = rng.randint(0, 255, (112, 112, 3), np.uint8)
        bins.append(imencode(a))
        if p % 2 == 0:
            bins.append(imencode(np.clip(a.astype(int) + 2, 0,
                                         255).astype(np.uint8)))
            issame.append(True)
        else:
            bins.append(imencode(rng.randint(0, 255, (112, 112, 3),
                                             np.uint8)))
            issame.append(False)
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f)


@pytest.mark.slow
def test_cli_test_clean_protocol(weight_folder, tmp_path):
    from msml_tpu.cli import test as cli_test
    _write_bin(str(tmp_path / "lfw.bin"))
    out_json = str(tmp_path / "res.json")
    cli_test.main(cli_test.parse_args(
        ["--network", "msml", "--weight_folder", weight_folder,
         "--bin", str(tmp_path / "lfw.bin"), "--no-occ",
         "--batch-size", "10", "--out-json", out_json]))
    rows = json.load(open(out_json))
    assert len(rows) == 1 and rows[0]["lo"] == 0
    assert 0.0 <= rows[0]["avg_acc"] <= 1.0
    assert len(rows[0]["tar_at_far"]) == 5


@pytest.mark.slow
def test_cli_eval_ijb_end_to_end(weight_folder, tmp_path):
    import cv2

    from msml_tpu.cli import eval_ijb
    root = tmp_path / "ijb"
    (root / "meta").mkdir(parents=True)
    (root / "loose_crop").mkdir()
    rng = np.random.RandomState(0)
    base = np.float32([[38.3, 51.7], [73.5, 51.5], [56.0, 71.7],
                       [41.5, 92.4], [70.7, 92.2]])
    n_img, per_t = 12, 2
    tid_mid, lmk_lines = [], []
    for i in range(n_img):
        name = f"c{i}.png"
        cv2.imwrite(str(root / "loose_crop" / name),
                    rng.randint(0, 255, (112, 112, 3), np.uint8))
        tid, mid = i // per_t, i % per_t
        tid_mid.append(f"{name} {tid} {mid}")
        pts = " ".join("%.2f" % v
                       for v in (base + rng.randn(5, 2)).reshape(-1))
        lmk_lines.append(f"{name} {pts} {rng.rand():.3f}")
    (root / "meta" / "ijbc_face_tid_mid.txt").write_text(
        "\n".join(tid_mid) + "\n")
    (root / "meta" / "ijbc_name_5pts_score.txt").write_text(
        "\n".join(lmk_lines) + "\n")
    pairs = ["0 1 1", "2 3 0", "4 5 1", "1 2 0", "3 4 1", "0 5 0"]
    (root / "meta" / "ijbc_template_pair_label.txt").write_text(
        "\n".join(pairs) + "\n")

    out_json = str(tmp_path / "ijb.json")
    table = eval_ijb.main(eval_ijb.parse_args(
        ["--weight_folder", weight_folder, "--ijb-root", str(root),
         "--target", "IJBC", "--batch-size", "5",
         "--out-json", out_json]))
    assert table and all(0.0 <= v <= 1.0 for v in table.values())
    saved = json.load(open(out_json))
    assert len(saved) == len(table)


@pytest.mark.slow
def test_cli_embed(weight_folder, tmp_path):
    """msml-embed: weight folder + aligned image folder -> l2-normalized
    flip-sum embeddings + names manifest."""
    from PIL import Image

    from msml_tpu.cli import embed
    src = tmp_path / "faces"
    (src / "idA").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, (112, 112, 3), np.uint8)).save(
            src / "idA" / f"f{i}.png")
    out = str(tmp_path / "feats.npy")
    feats, names = embed.main(embed.parse_args(
        ["--weight_folder", weight_folder, "--src", str(src),
         "--out", out, "--batch-size", "3"]))
    assert feats.shape == (5, 512) and len(names) == 5
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                               rtol=1e-5)
    assert names == sorted(names)
    saved = np.load(out)
    np.testing.assert_array_equal(saved, feats)
    manifest = open(out + ".names.txt").read().split()
    assert manifest == names


@pytest.mark.slow
def test_serve_spatial_runner_matches_plain(weight_folder):
    """runner_from_weight_folder(spatial=2) — the GSPMD spatial-partitioned
    serving forward — returns the same embeddings as the plain runner."""
    from msml_tpu.cli.serve import runner_from_weight_folder

    plain = runner_from_weight_folder(weight_folder, flip=False,
                                      l2_norm=False)
    sp = runner_from_weight_folder(weight_folder, spatial=2, flip=False,
                                   l2_norm=False)
    assert sp.meta["spatial"] == 2
    x = np.random.RandomState(0).randn(3, 112, 112, 3).astype(np.float32)
    a, b = plain.infer(x), sp.infer(x)
    assert a.shape == b.shape == (3, 512)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999999, cos
