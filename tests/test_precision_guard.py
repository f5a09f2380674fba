"""Precision-policy guardrail on the shipped bf16 training graph.

The flagship ships `fp16: true` -> bf16 compute / f32 params
(core/precision.py), the TPU analogue of the reference's AMP autocast
(`train.py:252`). A single silently-f32 convolution would halve MXU
throughput on TPU without failing any numeric test, so this lowers the
real SPMD train step to StableHLO (no XLA compile, no execution) and
asserts every convolution — forward and AD-generated backward — reads
bf16 operands. The known-f32 contractions (margin-head logits matmul and
the fc/feature layer, mirroring the reference's `.float()` casts at
`iresnet.py:232` / `msml.py:169`) are dot_generals, not convolutions, so
the invariant is exact: zero f32 convs.
"""

import re

import jax
import pytest

from msml_tpu.core.config import Config, config_init, lr_step_factor
from msml_tpu.core.mesh import make_mesh
from msml_tpu.data.synthetic import synthetic_batch
from msml_tpu.nn.msml import msml_from_config
from msml_tpu.train import optim
from msml_tpu.train.train_step import init_train_state, make_train_step

pytestmark = pytest.mark.slow  # full-model trace + lowering (~1 min)

# stablehlo.convolution(%a, %b) ... : (tensor<...>, tensor<...>) -> ...
_CONV_RE = re.compile(r"stablehlo\.convolution.*?:\s*\(([^)]*)\)")


def _conv_operand_types(stablehlo_text):
    """Yield the operand tensor-type strings of every convolution op."""
    for m in _CONV_RE.finditer(stablehlo_text):
        yield m.group(1)


def test_shipped_step_has_no_f32_convolutions():
    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": True, "batch_size": 2,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "test", "num_classes": 64,
        "out_folder": "/tmp/msml_test_out",
    })
    config_init(cfg)

    mesh = make_mesh()
    model = msml_from_config(cfg)  # policy derived from fp16: true
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, mesh)
    lr_scales = optim.build_lr_scales(state.params, cfg, mesh.shape["data"])
    step = make_train_step(model, cfg, mesh, lr_scales)

    batch = synthetic_batch(cfg.batch_size * mesh.shape["data"],
                            size=cfg.out_size[0], channels=3,
                            num_classes=cfg.num_classes, seed=0)
    del batch["ori"]
    text = step._jit.lower(state, batch, lr_step_factor(cfg, 0),
                           rng).as_text()

    convs = list(_conv_operand_types(text))
    # sanity: the trace really contains the full fwd+bwd conv graph
    # (iresnet18 + U-Net + 4 FM ops and their gradients)
    assert len(convs) > 80, f"only {len(convs)} convolutions in the trace"

    f32_convs = [c for c in convs if "xf32" in c or "xf64" in c]
    assert not f32_convs, (
        f"{len(f32_convs)} of {len(convs)} convolutions run in f32 under "
        f"the shipped bf16 policy; first: {f32_convs[0]}")
    assert sum("xbf16" in c for c in convs) == len(convs) - len(f32_convs)
