"""End-to-end cli.train smoke: the epoch loop wiring (device_prefetch,
scan windows, checkpointing, logging) in the actual entry point — the
round-3 `scan_unroll`-kwarg regression lived exactly in this glue and no
unit test touched it (`train.py:240-328` is the reference's equivalent
hot loop)."""

import json
import os
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("scan_steps", [1, 2])
def test_cli_train_synthetic_smoke(tmp_path, scan_steps):
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs",
                                           "arc18_msml.yaml")))
    cfg.update(dataset="synthetic", rec="", batch_size=4, num_classes=16,
               out_folder=str(tmp_path / "out"))
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "msml_tpu.cli.train", "--config",
         str(cfg_path), "--steps", str(2 * scan_steps), "--scan-steps",
         str(scan_steps), "--platform", "cpu", "--cpu-devices", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "training finished" in out.stdout + out.stderr
    # a checkpoint was written under the self-describing weight folder
    # (core/checkpoint.py stores under <output>/ckpt/<step>)
    outdir = tmp_path / "out"
    ckpts = list(outdir.rglob("ckpt"))
    assert ckpts and any(ckpts[0].iterdir()), sorted(
        str(p) for p in outdir.rglob("*"))[:20]
