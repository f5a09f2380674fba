"""In-training verification callback against a synthetic .bin set."""

import logging
import pickle

import pytest

import numpy as np

from msml_tpu.core.callbacks import CallBackVerification
from msml_tpu.data.recordio import imencode
from PIL import Image


def _make_bin(path, n_pairs=40, seed=0):
    # alternating same/diff so every 10-fold split holds both classes
    # (calculate_val_far divides by per-fold class counts,
    # verification.py:166-178)
    rng = np.random.RandomState(seed)

    def smooth():
        small = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
        return np.asarray(Image.fromarray(small).resize((112, 112)))

    bins, issame = [], []
    for p in range(n_pairs):
        a = smooth()
        bins.append(imencode(a))
        if p % 2 == 0:
            bins.append(imencode(np.clip(a.astype(int) + 2, 0,
                                         255).astype(np.uint8)))
            issame.append(True)
        else:
            bins.append(imencode(smooth()))
            issame.append(False)
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f)


def test_verification_callback(tmp_path, caplog):
    _make_bin(str(tmp_path / "lfw.bin"))

    def extract(arr):
        return arr.reshape(arr.shape[0], -1)[:, ::300]

    logger = logging.getLogger("msml_tpu")
    cb = CallBackVerification(100, ["lfw", "missing_set"], str(tmp_path),
                              extract, batch_size=8, logger=logger)
    assert cb.ver_name_list == ["lfw"]  # missing set skipped with warning
    assert cb(50) is None               # not at the cadence yet
    with caplog.at_level(logging.INFO, logger="msml_tpu"):
        results = cb(100)
    assert results is not None and len(results) == 1
    assert results[0] > 0.9             # near-duplicate pairs verify
    assert cb.highest_acc_list[0] == results[0]
    # highest-acc tracking across calls
    cb(200)
    assert cb.highest_acc_list[0] >= results[0]


def test_throughput_logger_windowed_steps_and_tic_reset(caplog):
    """Boundary-crossing trigger (multi-step scan windows skip exact
    multiples) and per-interval speed (regression: tic was never reset, so
    logged speed decayed over time)."""
    import re
    import time as _time

    from msml_tpu.core.logging import AverageMeter, ThroughputLogger

    logger = logging.getLogger("msml_tpu.test_tp")
    tl = ThroughputLogger(frequency=10, total_step=1000, global_batch=100,
                          num_chips=2, logger=logger)
    loss = AverageMeter()
    loss.update(1.0)

    speeds = []
    with caplog.at_level(logging.INFO, logger="msml_tpu.test_tp"):
        # steps advance by 8: 8, 16, 24, ... never hitting % 10 == 0
        for step in range(8, 130, 8):
            tl(step, loss, epoch=0)
            _time.sleep(0.01)
    for rec in caplog.records:
        m = re.match(r"Speed ([\d.]+) samples/sec", rec.message)
        if m:
            speeds.append(float(m.group(1)))
    # first boundary only starts the clock; crossings at 16,24,..,128 log
    assert len(speeds) >= 10
    # tic resets each log: speeds reflect the constant interval, so the
    # last is within ~3x of the first (the old bug decayed monotonically
    # toward zero)
    assert speeds[-1] > speeds[0] / 3


def test_verification_prepare_finish_hooks(tmp_path):
    """prepare_fn runs before the round, finish_fn after it (releasing the
    host param snapshot in the multihost path, cli/train.py)."""
    _make_bin(str(tmp_path / "lfw.bin"), n_pairs=20)
    calls = []
    cb = CallBackVerification(
        100, ["lfw"], str(tmp_path),
        lambda a: a.reshape(a.shape[0], -1)[:, ::300], batch_size=8,
        prepare_fn=lambda: calls.append("prep"),
        finish_fn=lambda: calls.append("fin"))
    res = cb.ver_test(100)
    assert calls == ["prep", "fin"] and len(res) == 1


@pytest.mark.slow
def test_metrics_writer_tensorboard(tmp_path):
    """MetricsWriter writes TB event scalars when wired into
    ThroughputLogger (the working version of the writer the reference
    plumbs as None, utils_callbacks.py:80-82); reference tags emitted."""
    import time as _time

    from msml_tpu.core.logging import (AverageMeter, MetricsWriter,
                                       ThroughputLogger)

    pytest.importorskip("torch.utils.tensorboard")
    logger = logging.getLogger("msml_tpu.test_tb")
    w = MetricsWriter(str(tmp_path / "tb"), logger)
    tl = ThroughputLogger(frequency=1, total_step=100, global_batch=10,
                          num_chips=1, logger=logger, writer=w)
    loss = AverageMeter()
    loss.update(2.5)
    for step in (1, 2, 3):
        tl(step, loss, epoch=0)
        loss.update(2.5)
        _time.sleep(0.01)
    w.scalar("cls_loss", 1.25, 3)
    w.flush()

    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    # reference tags + ours
    assert {"time_for_end", "loss", "samples_per_sec",
            "img_per_sec_per_chip", "cls_loss"} <= tags, tags
    assert acc.Scalars("loss")[0].value == pytest.approx(2.5)
    w.close()


def test_metrics_writer_degrades_without_backend(tmp_path, caplog):
    """No tensorboard backend -> warning + no-op scalars, never a crash."""
    import builtins

    from msml_tpu.core import logging as mlog

    real_import = builtins.__import__

    def failing_import(name, *a, **k):
        if name.startswith("torch.utils.tensorboard"):
            raise ImportError("no tensorboard in this env")
        return real_import(name, *a, **k)

    logger = logging.getLogger("msml_tpu.test_tb2")
    with caplog.at_level(logging.WARNING, logger="msml_tpu.test_tb2"):
        builtins.__import__ = failing_import
        try:
            w = mlog.MetricsWriter(str(tmp_path / "tb"), logger)
        finally:
            builtins.__import__ = real_import
    assert any("scalars disabled" in r.message for r in caplog.records)
    w.scalar("loss", 1.0, 1)  # no-op, no crash
    w.flush()
    w.close()
