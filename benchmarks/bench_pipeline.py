"""Pipeline-mode datapoint (VERDICT r4 #4): when does pp:N pay?

Measures, on the 8-virtual-device CPU mesh (no multi-chip TPU exists on
this rig — the numbers are a *shape* of the trade, the HBM arithmetic is
exact), for a deep homogeneous stack (default: 60 blocks at 14^2 x 256 —
2x iresnet100's stage 3):

  - per-device parameter + momentum bytes under pp:S vs data-parallel
    (exact, from the realized shardings — the memory lever)
  - compiled per-device temp/activation bytes (XLA memory_analysis)
  - step wall time pp:S vs dp on the same global batch (CPU-mesh proxy
    for the bubble + replicated-stem overhead)

python benchmarks/bench_pipeline.py [--blocks 60] [--stages 4]
"""

import argparse
import json
import time

import jax

jax.config.update("jax_platforms", "cpu")
import os  # noqa: E402
import sys  # noqa: E402

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/msml_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from msml_tpu.core.config import Config, config_init  # noqa: E402
from msml_tpu.core import parallelism as par  # noqa: E402
from msml_tpu.train import stack as sl  # noqa: E402


def tree_device_bytes(tree):
    """Bytes ONE device holds for this tree (shard-aware)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        shards = leaf.addressable_shards
        total += shards[0].data.nbytes if shards else leaf.nbytes
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=60)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--micro", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--classes", type=int, default=1000)
    ap.add_argument("--out-json", type=str, default="")
    args = ap.parse_args()

    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": True, "batch_size": args.batch,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": False,
        "fm_layers": [0, 0, 0, 0], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMCosFace", "header_params": [64.0, 0.4, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "bpp", "out_folder": "/tmp",
        "num_classes": args.classes, "stack_blocks": args.blocks,
        "stack_planes": 256})
    config_init(cfg, make_output_dir=False)
    cfg.num_classes = args.classes
    rng = jax.random.PRNGKey(0)
    npr = np.random.RandomState(0)
    batch = {"img": npr.randn(args.batch, 112, 112, 3).astype(np.float32),
             "label": npr.randint(0, args.classes, args.batch).astype(np.int32)}
    out = {"blocks": args.blocks, "planes": 256, "batch": args.batch,
           "note": "8-virtual-device CPU mesh; memory numbers exact, "
                   "times are a CPU proxy"}

    def timed_steps(step, state):
        state, _ = step(state, batch, 1.0, rng)           # compile
        jax.block_until_ready(jax.tree.leaves(state.params)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch, 1.0, rng)
        jax.block_until_ready(m["total_loss"])
        return (time.perf_counter() - t0) / args.steps * 1e3

    # ---- pp:S
    plan = par.parse_strategy(f"pp:{args.stages}")
    mesh = par.build_mesh(plan)
    state, modules = sl.init_stack_state(cfg, mesh, rng)
    scales = sl.build_stack_lr_scales(state.params, cfg)
    step = sl.make_stack_train_step(cfg, mesh, modules, scales, args.micro)
    out["pp_state_bytes_per_device"] = tree_device_bytes(
        state.params) + tree_device_bytes(state.momentum)
    out["pp_step_ms_cpu"] = round(timed_steps(step, state), 1)

    # ---- dp oracle: same stack, params replicated, batch sharded
    dmesh = Mesh(np.asarray(jax.devices()), ("data",))
    state2, _ = sl.init_stack_state(cfg, mesh, rng)
    repl = NamedSharding(dmesh, P())
    state2 = jax.tree.map(lambda x: jax.device_put(np.asarray(x), repl),
                          state2)
    seq = sl.sequential_stack_step(cfg, modules, scales, args.micro)

    def dp_step(state, b, lr, rng):
        b = {"img": jax.device_put(b["img"],
                                   NamedSharding(dmesh, P("data"))),
             "label": jax.device_put(b["label"],
                                     NamedSharding(dmesh, P("data")))}
        return seq(state, b, lr, rng)

    out["dp_state_bytes_per_device"] = tree_device_bytes(
        state2.params) + tree_device_bytes(state2.momentum)
    out["dp_step_ms_cpu"] = round(timed_steps(dp_step, state2), 1)

    out["memory_ratio"] = round(out["dp_state_bytes_per_device"]
                                / out["pp_state_bytes_per_device"], 2)
    print(json.dumps(out, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
