"""Training-throughput benchmark for the flagship arc18_msml config.

Measures images/sec/chip of the full MSML training step (FRB iresnet18 + OSB
U-Net + 4 FM ops + AMArcFace head + consensus seg loss, bf16 compute) on the
available TPU chip(s) with synthetic data (isolates device throughput; the
host pipeline is benchmarked separately).

Variants are read from the SHIPPED `configs/*.yaml` files (one source of
truth, including batch size) — `--variant peer_dec` benches exactly what
`cli.train --config configs/arc18_msml_peer_dec.yaml` would train.

Baseline: the reference publishes no numbers (BASELINE.md). The north star is
>2x an A100 running the PyTorch reference. A100_EST_IPS below is an estimate
of the reference's A100 AMP throughput for this config (~13.5 GFLOPs/img
train cost at realistic conv utilization); vs_baseline = measured / (2 *
A100_EST_IPS), so vs_baseline >= 1.0 means the target is met.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from msml_tpu.core.tpu_flags import apply_tuned_flags, flag_cache_dir

# measured-win libtpu flags (PERF.md flag sweep); must precede backend init
apply_tuned_flags()

# persistent compile cache: remote TPU compiles through the axon tunnel can
# take minutes and vary wildly; cache them across bench runs. The dir is
# keyed on LIBTPU_INIT_ARGS — libtpu flags are not part of jax's cache key,
# and a stale executable compiled under other flags would silently ignore
# the tuning.
jax.config.update("jax_compilation_cache_dir",
                  flag_cache_dir("/tmp/msml_jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# Estimated reference PyTorch AMP img/s on one A100. Grounded in
# BASELINE.md "A100 baseline derivation": 24.2 GFLOPs/img measured train
# cost (XLA cost analysis) / 312 TFLOP/s A100 peak at ~11.6% end-to-end
# utilization — centered between the insightface arcface_torch anchor
# (<=8% of peak, same research-code class) and NGC-grade ResNet50 (~24%,
# unreachable for eager multi-branch code with per-step Python in the
# loss). Band: 1030 (8%) .. 2060 (16%).
A100_EST_IPS = 1500.0
TARGET_IPS = 2.0 * A100_EST_IPS

SCAN_STEPS = 16    # steps per dispatched window (lax.scan inside one jit);
                   # amortizes the ~2 ms/step host->tunnel dispatch gap.
                   # Measured (PERF.md r3): 8 -> 3086.8, 16 -> 3097.8
                   # img/s/chip; override with MSML_SCAN_STEPS.
WARMUP_WINDOWS = 3  # covers initial compile + donation-aliasing recompile
MEASURE_WINDOWS = 16  # SCAN_STEPS*16 = 256 steps per fence: the final
                      # device-read costs one ~35 ms tunnel RTT; spreading it
                      # over more steps keeps the measurement close to the
                      # true device rate

_HERE = os.path.dirname(os.path.abspath(__file__))

# variant -> (shipped yaml, bench-only single-field overrides)
VARIANTS = {
    # flagship: README recipe (peer-less), the headline metric
    "flagship": ("configs/arc18_msml.yaml", {}),
    # the reference's shipped config.yaml:22-27 (peer teacher + conv towers
    # + decoder, ms1m classes)
    "peer_dec": ("configs/arc18_msml_peer_dec.yaml", {}),
    # peer_dec with the KD-metric-only conv2 towers skipped (legal at the
    # reference-default kd_loss_weight == 0; see nn/fm.py kd_metric)
    "peer_dec_nokd": ("configs/arc18_msml_peer_dec.yaml",
                      {"kd_metric": False}),
    # scale config (BASELINE.json config 4): ir100 + sampled PartialFC
    "ir100_pfc": ("configs/ir100_pfc.yaml", {}),
    # the width dividend (PERF.md r5): uniform 2x width measured 2.43x
    # step cost (deep stages are already lane-full and scale
    # quadratically); the honest dividend widens ONLY the underfilled
    # C=64 stage — wide_l1 below
    "wide2": ("configs/arc18_msml.yaml", {"width_mult": 2}),
    "wide_l1": ("configs/arc18_msml.yaml", {"width_mult": [2, 1, 1, 1]}),
}


def load_variant_config(variant: str):
    """Load the shipped yaml for a variant and derive fields, exactly as
    cli.train does (minus the output-folder side effects)."""
    from msml_tpu.core.config import config_init, load_yaml

    yaml_rel, overrides = VARIANTS[variant]
    cfg = load_yaml(os.path.join(_HERE, yaml_rel))
    for k, v in overrides.items():
        cfg[k] = v
    cfg.out_folder = "/tmp/msml_bench_out"
    config_init(cfg, make_output_dir=False)
    return cfg


def main(variant: str = "flagship"):
    from jax.sharding import Mesh
    from msml_tpu.core.precision import DEFAULT_POLICY
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train import optim
    from msml_tpu.train.train_step import init_train_state, make_train_step

    devices = jax.devices()
    n = len(devices)
    mesh = Mesh(np.array(devices), ("data",))

    cfg = load_variant_config(variant)
    if os.environ.get("MSML_BATCH_OVERRIDE"):   # sweep hook, bench-only
        cfg.batch_size = int(os.environ["MSML_BATCH_OVERRIDE"])
    if os.environ.get("MSML_REMAT_OVERRIDE"):   # sweep hook, bench-only:
        # "false" | "true" | comma list of FRB stage numbers ("1,2")
        r = os.environ["MSML_REMAT_OVERRIDE"]
        cfg.remat = (r == "true" if r in ("true", "false")
                     else tuple(int(s) for s in r.split(",")))
    if os.environ.get("MSML_DEVICE_LIGHT"):     # sweep hook, bench-only:
        # uint8 inputs + in-step relight/normalize (device_light mode)
        cfg.device_light = os.environ["MSML_DEVICE_LIGHT"] == "1"
    scan_steps = int(os.environ.get("MSML_SCAN_STEPS", SCAN_STEPS))
    use_pfc = bool(cfg.get("use_partial_fc"))
    pfc = None
    if use_pfc:
        from msml_tpu.heads.margin import get_margin_fn
        from msml_tpu.heads.partial_fc import PartialFC
        pfc = PartialFC(num_classes=cfg.num_classes,
                        embedding_size=cfg.dim_feature,
                        sample_rate=float(cfg.sample_rate),
                        margin_fn=get_margin_fn(cfg.header_type,
                                                cfg.header_params))

    model = msml_from_config(cfg, policy=DEFAULT_POLICY,
                             external_header=use_pfc)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, mesh, use_pfc=use_pfc)
    lr_scales = optim.build_lr_scales(state.params, cfg, n)
    scan_unroll = int(os.environ.get("MSML_SCAN_UNROLL",
                                     cfg.get("scan_unroll", 2)))
    step = make_train_step(model, cfg, mesh, lr_scales, pfc,
                           scan_steps=scan_steps, scan_unroll=scan_unroll)

    batch_per_chip = int(cfg.batch_size)
    global_batch = batch_per_chip * n
    batch = synthetic_batch(global_batch, size=cfg.out_size[0],
                            num_classes=cfg.num_classes,
                            uint8=bool(cfg.get("device_light")))
    if not cfg.peer_params.get("use_ori"):
        del batch["ori"]
    batch = jax.tree.map(lambda x: np.broadcast_to(
        x, (scan_steps,) + x.shape).copy(), batch)
    batch = jax.device_put(batch)

    # NOTE: through the axon TPU relay, block_until_ready can return before
    # remote execution finishes; an explicit device_get is the only reliable
    # fence (the step chain serializes through the donated state, so fencing
    # the final metrics fences the whole chain).
    from msml_tpu.core.profiling import fence
    for _ in range(WARMUP_WINDOWS):
        state, metrics = step(state, batch, 1.0, rng)
    fence(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_WINDOWS):
        state, metrics = step(state, batch, 1.0, rng)
    fence(metrics["total_loss"])
    dt = time.perf_counter() - t0

    ips = MEASURE_WINDOWS * scan_steps * global_batch / dt
    ips_chip = ips / n
    # metric names follow the yaml's output_prefix (round-2 continuity:
    # flagship -> arc18_msml_..., peer_dec -> arc18_msml_peer_dec_...)
    prefix = str(cfg.output_prefix)
    if variant == "peer_dec_nokd":
        prefix += "_nokd"
    name = f"{prefix}_train_images_per_sec_per_chip"
    print(json.dumps({
        "metric": name,
        "value": round(ips_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(ips_chip / TARGET_IPS, 4),
    }))


if __name__ == "__main__":
    import sys
    variant = "flagship"
    if "--variant" in sys.argv:
        i = sys.argv.index("--variant") + 1
        if i >= len(sys.argv):
            raise SystemExit(f"--variant needs a value: {sorted(VARIANTS)}")
        variant = sys.argv[i]
    if variant not in VARIANTS:
        raise SystemExit(f"unknown variant {variant!r}: {sorted(VARIANTS)}")
    main(variant)
