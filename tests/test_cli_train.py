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
@pytest.mark.parametrize("scan_steps,dcn_slices", [(1, 1), (2, 1), (2, 2)])
def test_cli_train_synthetic_smoke(tmp_path, scan_steps, dcn_slices):
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs",
                                           "arc18_msml.yaml")))
    cfg.update(dataset="synthetic", rec="", batch_size=4, num_classes=16,
               out_folder=str(tmp_path / "out"))
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    tb_args = (["--tensorboard", "--log-every", "1"]
               if scan_steps == 1 else [])
    # dcn_slices=2 drives the multi-slice mesh through the whole entry
    # point: 2-axis batch sharding in device_prefetch scan windows,
    # mesh_world LR scaling, checkpointing of the 2-D-mesh state
    out = subprocess.run(
        [sys.executable, "-m", "msml_tpu.cli.train", "--config",
         str(cfg_path), "--steps", str(2 * scan_steps), "--scan-steps",
         str(scan_steps), "--platform", "cpu", "--cpu-devices", "4",
         "--dcn-slices", str(dcn_slices)] + tb_args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "training finished" in out.stdout + out.stderr
    if tb_args:
        events = list((tmp_path / "out").rglob("tb/events*"))
        assert events and events[0].stat().st_size > 0, \
            sorted(str(p) for p in (tmp_path / "out").rglob("*"))[:20]
    # a checkpoint was written under the self-describing weight folder
    # (core/checkpoint.py stores under <output>/ckpt/<step>)
    outdir = tmp_path / "out"
    ckpts = list(outdir.rglob("ckpt"))
    assert ckpts and any(ckpts[0].iterdir()), sorted(
        str(p) for p in outdir.rglob("*"))[:20]


@pytest.mark.slow
def test_cli_train_sigterm_preemption(tmp_path):
    """TPU-VM preemption contract: SIGTERM mid-training -> full checkpoint
    at the next step boundary + clean exit (rc 0), resumable with --resume.
    The signal is sent as soon as the run's training.log appears (i.e.
    after the handler is installed but typically during compile), proving
    the flag survives the compile phase and is honored at the first step."""
    import signal
    import time

    cfg = yaml.safe_load(open(os.path.join(REPO, "configs",
                                           "arc18_msml.yaml")))
    cfg.update(dataset="synthetic", rec="", batch_size=4, num_classes=16,
               out_folder=str(tmp_path / "out"))
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "msml_tpu.cli.train", "--config",
         str(cfg_path), "--steps", "50", "--platform", "cpu",
         "--cpu-devices", "4"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        # wait for init_logging's file (created right after the handler)
        deadline = time.time() + 300
        log = None
        while time.time() < deadline:
            logs = list((tmp_path / "out").rglob("training.log"))
            if logs:
                log = logs[0]
                break
            if proc.poll() is not None:
                break
            time.sleep(1.0)
        if log is None or proc.poll() is not None:
            # failure path: kill BEFORE reading the pipe (reading a live
            # process's stdout blocks until EOF)
            rc = proc.poll()
            proc.kill()
            out, _ = proc.communicate()
            raise AssertionError((rc, out[-3000:]))
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=1200)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out[-3000:]
    assert "preemption checkpoint" in out, out[-3000:]
    ckpts = list((tmp_path / "out").rglob("ckpt"))
    assert ckpts and any(ckpts[0].iterdir())
    # and the checkpoint is at a step > 0 (saved after a real step)
    steps = [int(p.name) for p in ckpts[0].iterdir() if p.name.isdigit()]
    assert steps and max(steps) > 0, steps
