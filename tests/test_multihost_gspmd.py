"""Multihost for the GSPMD family (VERDICT r4 #3): the ``tp:N`` /
``gspmd(+fsdp)`` strategies must run across real process boundaries, not
just a single-process mesh.

The reference's only distribution mode is inherently multi-process
(`train.py:44-57`); round 4 proved the shard_map family there (fsdp x
PartialFC x multihost). This closes the remaining refusal: a real
2-process jax.distributed rendezvous on the CPU backend running the
``tp:2`` strategy (Megatron column/row GSPMD sharding, dense head) over a
(data=2, model=2) mesh whose DATA axis crosses the process boundary —
compared against a single-process 4-device run of the SAME strategy on
the same global batches.
"""

import json
import os
import re
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = textwrap.dedent("""
    # shared builder: the composable-parallelism surface end to end
    import jax
    import jax.numpy as jnp

    NUM_CLASSES, BS, STEPS = 16, 4, 2

    def build(strategy):
        from msml_tpu.core import parallelism as par
        from msml_tpu.core.config import Config, config_init
        from msml_tpu.core.precision import DEFAULT_POLICY
        from msml_tpu.nn.msml import msml_from_config
        from msml_tpu.train import optim

        cfg = Config.from_dict({
            "dataset": "synthetic", "fp16": True, "batch_size": BS,
            "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
            "fm_layers": [1, 0, 0, 0],
            "fm_params": [3, 2, "sigmoid", "mul"],
            "peer_params": {"use_ori": False, "use_conv": False,
                            "mask_trans": "conv", "use_decoder": False},
            "header_type": "AMCosFace",
            "header_params": [64.0, 0.4, 0.0, 0.0],
            "exp_id": 0, "output_prefix": "mhg", "out_folder": "/tmp"})
        config_init(cfg, make_output_dir=False)
        cfg.num_classes = NUM_CLASSES

        plan = par.parse_strategy(strategy)
        par.validate_plan(plan, use_pfc=False,
                          multihost=jax.process_count() > 1)
        mesh = par.build_mesh(plan)
        model = msml_from_config(cfg, policy=DEFAULT_POLICY,
                                 external_header=False)
        rng = jax.random.PRNGKey(0)
        state = par.init_state(plan, model, cfg, rng, mesh)
        lr_scales = optim.build_lr_scales(state.params, cfg,
                                          jax.device_count())
        step = par.make_step(plan, model, cfg, mesh, lr_scales, None)
        return cfg, mesh, state, step
""")

CHILD = textwrap.dedent("""
    import sys, os, json
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/msml_jax_cache_mh")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address=sys.argv[2],
                               num_processes=2, process_id=pid)
    # establish the CPU Gloo context NOW, while the ranks are still in
    # lock-step: on a loaded 1-core box the first implicit collective
    # (device_put's cross-host assert_equal during init) can otherwise be
    # reached >30 s apart and time out the Gloo context creation
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mhg_start")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as SpecP
    from msml_tpu.data.pipeline import device_prefetch
    from msml_tpu.data.synthetic import SyntheticDataset

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gspmd_parity_common import build, NUM_CLASSES, BS, STEPS

    assert jax.process_count() == 2 and jax.device_count() == 4
    strategy = os.environ.get("MSML_MHG_STRATEGY", "tp:2")
    cfg, mesh, state, step_fn = build(strategy)
    # the data axis spans the two processes; model axis is process-local
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 2

    # per-process shard of the global batch (data-axis row = this process)
    ds = SyntheticDataset(batch_size=BS, steps_per_epoch=STEPS,
                          num_classes=NUM_CLASSES, shard_id=pid,
                          num_shards=2)
    rng = jax.random.PRNGKey(42)

    # AOT compile + coordinator barrier BEFORE the first execution
    gb = BS * 2
    shard = NamedSharding(mesh, SpecP("data"))
    absb = {"img": jax.ShapeDtypeStruct((gb, 112, 112, 3), jnp.float32,
                                        sharding=shard),
            "msk": jax.ShapeDtypeStruct((gb, 112, 112), jnp.int32,
                                        sharding=shard),
            "label": jax.ShapeDtypeStruct((gb,), jnp.int32, sharding=shard)}
    step_fn.precompile(state, absb, rng)
    from jax._src import distributed as _dist
    _c = _dist.global_state.client
    if _c is not None and hasattr(_c, "wait_at_barrier"):
        _c.wait_at_barrier("msml_mhg_compiled", 3000000)

    losses = []
    feed = ({k: v for k, v in b.items() if k != "ori"}
            for b in ds.epoch(0))
    for batch in device_prefetch(feed, mesh):
        state, metrics = step_fn(state, batch, 1.0, rng)
        losses.append(float(metrics["total_loss"]))
    csum = jax.jit(lambda t: sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                                 for x in jax.tree.leaves(t)))
    psum = float(csum(state.params))
    msum = float(csum(state.momentum))
    print("RESULT" + str(pid) + json.dumps(
        {"losses": losses, "param_abs_sum": psum, "mom_abs_sum": msum}),
        flush=True)
""")

SINGLE = textwrap.dedent("""
    import sys, os, json
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/msml_jax_cache_mh")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gspmd_parity_common import build, NUM_CLASSES, BS, STEPS
    from msml_tpu.data.synthetic import synthetic_batch

    assert jax.device_count() == 4
    strategy = os.environ.get("MSML_MHG_STRATEGY", "tp:2")
    cfg, mesh, state, step_fn = build(strategy)

    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(STEPS):
        parts = [synthetic_batch(BS, 112, 3, NUM_CLASSES,
                                 seed=(0 + 0 * 100003 + i) * 2 + shard)
                 for shard in range(2)]
        batch = {k: np.concatenate([p[k] for p in parts])
                 for k in parts[0] if k != "ori"}
        state, metrics = step_fn(state, batch, 1.0, rng)
        losses.append(float(metrics["total_loss"]))
    csum = jax.jit(lambda t: sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                                 for x in jax.tree.leaves(t)))
    psum = float(csum(state.params))
    msum = float(csum(state.momentum))
    print("RESULT0" + json.dumps(
        {"losses": losses, "param_abs_sum": psum, "mom_abs_sum": msum}),
        flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(tmp_path, strategy):
    (tmp_path / "gspmd_parity_common.py").write_text(COMMON)
    child = tmp_path / "child.py"
    child.write_text(CHILD % {"repo": REPO})
    single = tmp_path / "single.py"
    single.write_text(SINGLE % {"repo": REPO})
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["MSML_MHG_STRATEGY"] = strategy

    sp = subprocess.Popen([sys.executable, str(single)], env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    sp_out, _ = sp.communicate(timeout=3000)
    addr = f"127.0.0.1:{_free_port()}"
    procs = [subprocess.Popen([sys.executable, str(child), str(i), addr],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3000)
        outs.append(out.decode())
    outs.append(sp_out.decode())
    for i, (p, out) in enumerate(zip(procs + [sp], outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"

    def result(out):
        m = re.search(r"RESULT\d(\{.*\})", out)
        assert m, out[-2000:]
        return json.loads(m.group(1))

    r0, r1, rs = (result(o) for o in outs)
    # the two ranks agree exactly (replicated jitted checksum)
    assert r0["losses"] == r1["losses"]
    np.testing.assert_allclose(r0["param_abs_sum"], r1["param_abs_sum"],
                               rtol=1e-12)
    # 2-process (2x2) == 1-process (2x2) on the same global batches,
    # bf16-reassociation-bounded (same rationale/tolerances as
    # test_multihost.py: cross-process Gloo vs single-process all-reduce
    # lower different reduction trees)
    np.testing.assert_allclose(r0["losses"], rs["losses"], rtol=2e-3)
    np.testing.assert_allclose(r0["param_abs_sum"], rs["param_abs_sum"],
                               rtol=1e-3)
    np.testing.assert_allclose(r0["mom_abs_sum"], rs["mom_abs_sum"],
                               rtol=2e-3)


@pytest.mark.slow
def test_two_process_tp_matches_single_process(tmp_path):
    """tp:2 across 2 real processes == the same strategy in one process:
    TP's per-block psums stay process-local (model axis), the data-axis
    grad reduction crosses the boundary."""
    _run(tmp_path, "tp:2")


@pytest.mark.slow
def test_two_process_tp_fsdp_matches_single_process(tmp_path):
    """tp:2+fsdp: the ZeRO-sharded leaves live SPLIT across the process
    boundary (data axis) while TP leaves shard process-locally — both
    GSPMD hint families cross-process at once."""
    _run(tmp_path, "tp:2+fsdp")
