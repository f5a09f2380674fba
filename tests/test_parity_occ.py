"""Occluded-protocol both-stacks parity (tools/parity_occ.py), one case —
the full grid lives in BASELINE.md. Slow: two full-MSML forwards (torch +
jax) on CPU."""

import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo absent")
def test_occ_protocol_parity_one_case(tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841
    from msml_tpu.tools.parity_occ import main, parse_args
    res = main(parse_args([
        "--synthetic", "25", "--batch-size", "25", "--cases", "1",
        "--workdir", str(tmp_path)]))
    assert all(res["block_pixel_alignment"].values())
    assert res["all_pass"], res
