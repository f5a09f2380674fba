"""IJB metric-chain parity vs the reference qeval_ijbc.py functions
executed in place (tools/parity_ijb.py). Fast: pure numpy/sklearn."""

import os

import pytest

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo absent")
def test_ijb_metric_chain_parity():
    from msml_tpu.tools.parity_ijb import main, parse_args
    res = main(parse_args(["--images", "300", "--templates", "40",
                           "--pairs", "1500"]))
    assert res["all_pass"], res
