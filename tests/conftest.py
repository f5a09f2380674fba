"""Test config: force CPU with 8 virtual devices so multi-chip sharding
(PartialFC collectives, data-parallel train step) is exercised without TPU
hardware — the strategy SURVEY.md §4 prescribes.

Note: this environment pre-imports jax with JAX_PLATFORMS=axon via
sitecustomize, so plain env vars are too late — jax.config.update is the
only switch that still works; XLA_FLAGS is read lazily at backend init and
can still be set here."""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the heavy model-graph compiles dominate suite
# time; cache them across runs (MSML_TEST_CACHE_DIR overrides, e.g. for
# cold-cache timing of the fast tier)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MSML_TEST_CACHE_DIR",
                                 "/tmp/msml_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
