"""Inference (eval forward) throughput of the flagship model on the chip.

Usage: bench_eval.py [BATCH] [--quant int8]
--quant int8 measures the PTQ serving path (core/quantize.py): v5e runs
s8 MXU ops at 2x the bf16 rate, so this bounds the serving speedup."""
import json
import sys
import os
import time

import jax
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msml_tpu.core.tpu_flags import apply_tuned_flags, flag_cache_dir  # noqa: E402

apply_tuned_flags()  # measure under the flags that ship (PERF.md flag sweep)
jax.config.update("jax_compilation_cache_dir",
                  flag_cache_dir("/tmp/msml_jax_cache_tpu"))

import jax.numpy as jnp
from msml_tpu.core.config import Config, config_init
from msml_tpu.core.precision import DEFAULT_POLICY
from msml_tpu.nn.msml import msml_from_config

import argparse

_ap = argparse.ArgumentParser(description="flagship eval-forward bench")
_ap.add_argument("batch", nargs="?", type=int, default=512)
_ap.add_argument("--quant", default="", choices=["", "int8"])
_ap.add_argument("--min-contract", type=int, default=64,
                 help="quantize only ops with reduction width >= this")
_args = _ap.parse_args()
B = _args.batch
cfg = Config.from_dict({
    "dataset": "synthetic", "fp16": True, "batch_size": B,
    "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
    "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
    "peer_params": {"use_ori": False, "use_conv": False,
                    "mask_trans": "conv", "use_decoder": False},
    "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
    "exp_id": 0, "output_prefix": "bench", "num_classes": 10572,
    "out_folder": "/tmp/msml_bench_out"})
config_init(cfg)
model = msml_from_config(cfg, policy=DEFAULT_POLICY)
rng = jax.random.PRNGKey(0)
x = jnp.zeros((B, 112, 112, 3), jnp.float32)
v = model.init({"params": rng, "dropout": rng}, x,
               jnp.zeros((B,), jnp.int32), train=True)
v = {"params": v["params"], "batch_stats": v["batch_stats"]}


QUANT = _args.quant
MIN_CONTRACT = _args.min_contract


def _fwd(img):
    feature, _ = model.apply(v, img, train=False)
    return feature


if QUANT == "int8":
    from msml_tpu.core.quantize import quantize_fn
    fwd = jax.jit(quantize_fn(_fwd, min_contract=MIN_CONTRACT))
else:
    fwd = jax.jit(_fwd)


imgs = jnp.asarray(np.random.RandomState(0).randn(B, 112, 112, 3),
                   jnp.float32)
out = None
for _ in range(3):
    out = fwd(imgs)
float(out[0, 0])
N = 40
t0 = time.perf_counter()
for _ in range(N):
    out = fwd(imgs)
float(out[0, 0])
dt = time.perf_counter() - t0
suffix = f"_{QUANT}" if QUANT else ""
if QUANT and MIN_CONTRACT != 64:
    suffix += f"_mc{MIN_CONTRACT}"
print(json.dumps({"metric": f"arc18_msml_eval_images_per_sec_b{B}{suffix}",
                  "value": round(N * B / dt, 2), "unit": "img/s"}))
