"""Tuned libtpu/XLA compiler flags (measured wins only; PERF.md round 3).

The reference has no analogue — CUDA heuristics are fixed at build time;
on TPU the XLA compiler exposes tuning knobs through `LIBTPU_INIT_ARGS`.
A measured sweep on the v5e chip (PERF.md "libtpu flag sweep") found
`--xla_tpu_enable_experimental_fusion_cost_model=true` worth +1.5% on the
flagship step and nothing else recoverable (raising scoped VMEM was -5.5%;
latency-hiding scheduler, rwb-fusion-off and region-based copy insertion
were noise).

`apply_tuned_flags()` must run before the TPU backend initializes (first
device use, not `import jax`). Escape hatch: `MSML_NO_TUNED_FLAGS=1`
(e.g. for a libtpu version that does not know a flag — unknown flags fail
loudly at backend init). Flags already present in `LIBTPU_INIT_ARGS` are
never overridden.
"""

from __future__ import annotations

import os

TUNED_FLAGS = (
    "--xla_tpu_enable_experimental_fusion_cost_model=true",
)


def apply_tuned_flags() -> str:
    """Append tuned flags to LIBTPU_INIT_ARGS (idempotent; user-set values
    win) and enable the persistent compilation cache (remote TPU compiles
    cost 3-30 min; every CLI entry point should reuse them across runs —
    r5 fix: previously only bench/tests set the cache, so cli.train paid
    a cold compile every launch). Returns the resulting flag value."""
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if os.environ.get("MSML_NO_TUNED_FLAGS") != "1":
        present = {t.split("=", 1)[0] for t in cur.split()}
        add = [f for f in TUNED_FLAGS if f.split("=", 1)[0] not in present]
        if add:
            cur = (cur + " " + " ".join(add)).strip()
            os.environ["LIBTPU_INIT_ARGS"] = cur
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                flag_cache_dir(os.environ.get("MSML_COMPILE_CACHE",
                                              "/tmp/msml_jax_cache_tpu")))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              5.0)
    except Exception:
        pass  # cache is an optimization; never block startup on it
    return cur


def flag_cache_dir(base: str) -> str:
    """Persistent-compile-cache dir keyed on LIBTPU_INIT_ARGS: libtpu
    flags are not part of jax's cache key, so executables compiled under
    different flags must not share a cache."""
    import hashlib
    flags = os.environ.get("LIBTPU_INIT_ARGS", "")
    if not flags:
        return base
    return f"{base}_{hashlib.md5(flags.encode()).hexdigest()[:8]}"
