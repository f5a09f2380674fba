"""Folder-eval (MFR2/PKU) both-stacks parity (tools/parity_folder.py):
pair loading, input transform, and metric chain vs the reference's
qeval_folder executed in place. Light (no model forward)."""

import os

import pytest

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo absent")
def test_folder_eval_parity(tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841
    from msml_tpu.tools.parity_folder import main, parse_args
    res = main(parse_args(["--workdir", str(tmp_path), "--pairs", "200"]))
    assert res["pair_loading"]["pass"]
    assert res["input_transform"]["max_delta"] == 0.0
    assert res["metric_chain"]["acc_delta"] == 0.0
    assert res["metric_chain"]["tarfar_max_delta"] == 0.0
    assert res["all_pass"], res
