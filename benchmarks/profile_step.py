"""Per-op profile + optimized-HLO dump of a bench variant's train step.

Usage: python benchmarks/profile_step.py [variant] [--hlo-only]

Produces:
  /tmp/msml_prof_<variant>/          xprof trace (tensorboard-readable)
  /tmp/msml_prof_<variant>_ops.json  framework_op_stats rows (per-op device
                                     times, aggregated over the traced steps)
  /tmp/msml_prof_<variant>.hlo       optimized HLO of the step (AOT compile)
  stdout: top-category table (conv / reduce / copy / elementwise / ...)

One TPU job at a time (single tunnel chip).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msml_tpu.core.tpu_flags import apply_tuned_flags, flag_cache_dir  # noqa: E402

apply_tuned_flags()  # profile what ships (PERF.md flag sweep)
jax.config.update("jax_compilation_cache_dir",
                  flag_cache_dir("/tmp/msml_jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

SCAN_STEPS = 8


def build(variant):
    from jax.sharding import Mesh
    from bench import load_variant_config
    from msml_tpu.core.precision import DEFAULT_POLICY
    from msml_tpu.data.synthetic import synthetic_batch
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train import optim
    from msml_tpu.train.train_step import init_train_state, make_train_step

    devices = jax.devices()
    n = len(devices)
    mesh = Mesh(np.array(devices), ("data",))
    cfg = load_variant_config(variant)
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
    step = make_train_step(model, cfg, mesh, lr_scales, pfc,
                           scan_steps=SCAN_STEPS)
    batch = synthetic_batch(int(cfg.batch_size) * n, size=cfg.out_size[0],
                            num_classes=cfg.num_classes)
    if not cfg.peer_params.get("use_ori"):
        del batch["ori"]
    batch = jax.tree.map(lambda x: np.broadcast_to(
        x, (SCAN_STEPS,) + x.shape).copy(), batch)
    batch = jax.device_put(batch)
    return step, state, batch, rng


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n and "convert" not in n:
        return "conv"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "matmul"
    if "reduce_sum" in n or n.startswith("reduce") or "sum" in n:
        return "reduce"
    if "copy" in n:
        return "copy"
    if "transpose" in n or "reshape" in n:
        return "reshape/transpose"
    if "convert" in n or "bitcast" in n:
        return "convert"
    if "idle" in n:
        return "IDLE"
    return "other"


def main():
    variant = "flagship"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        variant = args[0]
    hlo_only = "--hlo-only" in sys.argv

    step, state, batch, rng = build(variant)

    # ---- optimized HLO dump (AOT)
    hlo_path = f"/tmp/msml_prof_{variant}.hlo"
    # use the shipped inner jit (step._jit, train_step.py) so the dump
    # keeps its donate_argnums buffer aliasing — re-jitting the wrapper
    # would trace the donating jit inline and lose the donation
    inner = getattr(step, "_jit", None)
    if inner is not None:
        lowered = inner.lower(state, batch, jnp.float32(1.0), rng)
    else:
        lowered = jax.jit(step).lower(state, batch, 1.0, rng)
    compiled = lowered.compile()
    with open(hlo_path, "w") as f:
        f.write(compiled.as_text())
    print("wrote", hlo_path)
    if hlo_only:
        return

    # ---- warmup + traced steps
    for _ in range(3):
        state, metrics = step(state, batch, 1.0, rng)
    float(metrics["total_loss"])
    trace_dir = f"/tmp/msml_prof_{variant}"
    from msml_tpu.core.profiling import fence
    from msml_tpu.core.profiling import trace as xprof_trace
    with xprof_trace(trace_dir):
        for _ in range(2):  # 2 windows x SCAN_STEPS steps
            state, metrics = step(state, batch, 1.0, rng)
        fence(metrics["total_loss"])
    time.sleep(1)

    # ---- aggregate framework_op_stats
    import glob
    xplanes = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    assert xplanes, f"no xplane under {trace_dir}"
    f = max(xplanes, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data([f], "framework_op_stats", {})
    rows = json.loads(data.decode() if isinstance(data, bytes) else data)
    table = rows[0] if isinstance(rows, list) else rows
    cols = [c["id"] for c in table["cols"]]
    out_rows = []
    for r in table["rows"]:
        rec = {cols[i]: c["v"] for i, c in enumerate(r["c"])}
        out_rows.append(rec)
    with open(f"/tmp/msml_prof_{variant}_ops.json", "w") as fo:
        json.dump(out_rows, fo, indent=1)
    print("wrote", f"/tmp/msml_prof_{variant}_ops.json", len(out_rows), "ops")

    dev = [r for r in out_rows if str(r.get("host_or_device", "")).lower()
           .startswith("device")]
    total = sum(float(r.get("total_self_time", 0) or 0) for r in dev)
    by_cat = {}
    for r in dev:
        cat = categorize(str(r.get("operation", r.get("op_name", ""))))
        by_cat.setdefault(cat, [0.0, 0])
        by_cat[cat][0] += float(r.get("total_self_time", 0) or 0)
        by_cat[cat][1] += int(float(r.get("occurrences", 1) or 1))
    print(f"\ndevice self-time total: {total*1e3:.2f} ms (traced steps)")
    for cat, (t, occ) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {100*t/max(total,1e-12):5.1f}%  {t*1e3:8.2f} ms  "
              f"x{occ:5d}  {cat}")
    print("\ntop 15 ops by self time:")
    for r in sorted(dev, key=lambda r: -float(r.get("total_self_time", 0)
                                              or 0))[:15]:
        print(f"  {float(r['total_self_time'])*1e3:8.2f} ms x"
              f"{int(float(r.get('occurrences', 1))):4d}  "
              f"{r.get('operation', '?')}")


if __name__ == "__main__":
    main()
