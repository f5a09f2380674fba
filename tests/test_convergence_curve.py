"""Regression pin for the committed from-scratch convergence run
(VERDICT r3 #4): the hardware run's verification curve must exist, be
non-saturated (strictly between 0.5 and 1.0), and RISE across its
verification points; the final window is pinned with an absolute floor.

The artifact (benchmarks/results/convergence_r4.json) is produced by the
on-chip run documented in PERF.md ("from-scratch convergence", round 4):
cli.train on the 10k-id procedural-identity rec
(tools/make_synthetic_rec.py), clean-protocol verification on held-out
views via the standard CallBackVerification every N steps. Regenerate
with the command recorded inside the artifact."""

import json
import os

import pytest

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "results",
    "convergence_r4.json")


@pytest.fixture(scope="module")
def curve():
    if not os.path.exists(ARTIFACT):
        pytest.fail(f"committed convergence artifact missing: {ARTIFACT}")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_curve_shape(curve):
    pts = curve["verification"]  # [{"step": int, "acc": float}, ...]
    assert len(pts) >= 3, "need >= 3 verification points"
    steps = [p["step"] for p in pts]
    assert steps == sorted(steps)


def test_curve_non_saturated_and_rising(curve):
    pts = curve["verification"]
    accs = [p["acc"] for p in pts]
    # strictly between chance and saturation at every point
    assert all(0.5 < a < 1.0 for a in accs), accs
    # rises: the final point beats the first by a real margin, and the
    # curve is monotone up to small verification noise
    assert accs[-1] - accs[0] > 0.05, accs
    for a, b in zip(accs, accs[1:]):
        assert b >= a - 0.02, f"non-monotone beyond noise: {accs}"


def test_final_window_pinned(curve):
    pts = curve["verification"]
    final = pts[-1]["acc"]
    lo, hi = curve["final_window"]
    assert lo <= final <= hi, (final, lo, hi)
    # loss decreased over training
    assert curve["loss"]["final"] < curve["loss"]["initial"] * 0.7
