"""ir100_pfc throughput with a remat-mode override: python bench_ir100.py [all|sel34|sel3|none]"""
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

from jax.sharding import Mesh
from msml_tpu.core.config import config_init, load_yaml
from msml_tpu.core.precision import DEFAULT_POLICY
from msml_tpu.data.synthetic import synthetic_batch
from msml_tpu.heads.margin import get_margin_fn
from msml_tpu.heads.partial_fc import PartialFC
from msml_tpu.nn.msml import msml_from_config
from msml_tpu.train import optim
from msml_tpu.train.train_step import init_train_state, make_train_step

MODE = sys.argv[1] if len(sys.argv) > 1 else "all"
REMAT = {"all": True, "sel34": [3, 4], "sel3": [3], "none": False}[MODE]
B = 64
SCAN = 8
WINDOWS = 6

cfg = load_yaml(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs/ir100_pfc.yaml"))
cfg.out_folder = "/tmp/msml_bench_out"
cfg.remat = REMAT
config_init(cfg, make_output_dir=True)
cfg.batch_size = B

devices = jax.devices()
n = len(devices)
mesh = Mesh(np.array(devices), ("data",))
model = msml_from_config(cfg, policy=DEFAULT_POLICY, external_header=True)
pfc = PartialFC(num_classes=cfg.num_classes, embedding_size=cfg.dim_feature,
                sample_rate=float(cfg.sample_rate),
                margin_fn=get_margin_fn(cfg.header_type, cfg.header_params))
rng = jax.random.PRNGKey(0)
state = init_train_state(model, cfg, rng, mesh, use_pfc=True)
lr_scales = optim.build_lr_scales(state.params, cfg, n)
step = make_train_step(model, cfg, mesh, lr_scales, pfc, scan_steps=SCAN)
batch = synthetic_batch(B * n, size=112, num_classes=cfg.num_classes)
del batch["ori"]
batch = jax.tree.map(lambda x: np.broadcast_to(
    x, (SCAN,) + x.shape).copy(), batch)
batch = jax.device_put(batch)
for _ in range(3):
    state, metrics = step(state, batch, 1.0, rng)
float(metrics["total_loss"])
t0 = time.perf_counter()
for _ in range(WINDOWS):
    state, metrics = step(state, batch, 1.0, rng)
float(metrics["total_loss"])
dt = time.perf_counter() - t0
ips = WINDOWS * SCAN * B * n / dt / n
print(json.dumps({"metric": f"ir100_pfc_{MODE}", "value": round(ips, 2),
                  "unit": "img/s/chip"}))
