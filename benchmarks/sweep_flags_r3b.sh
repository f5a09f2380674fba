#!/bin/bash
# Round-3 second libtpu flag sweep (flagship bench, serialized — one TPU job
# at a time). Each run keys its own compile-cache dir via LIBTPU_INIT_ARGS
# (core/tpu_flags.flag_cache_dir). Unknown flags fail loudly at backend
# init; that run just records the failure.
#
# Usage: bash benchmarks/sweep_flags_r3b.sh [logfile]
set -u
LOG=${1:-/tmp/flag_sweep_r3b.log}
cd "$(dirname "$0")/.."

FCM=--xla_tpu_enable_experimental_fusion_cost_model=true

run() {
  local name="$1"; shift
  local flags="$*"
  echo "=== $name [$flags] ===" >> "$LOG"
  LIBTPU_INIT_ARGS="$flags" MSML_NO_TUNED_FLAGS=0 \
    timeout 3000 python bench.py >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

: > "$LOG"
# baseline re-check under the shipped tuned flag
run fcm_baseline "$FCM"
# scoped VMEM below default direction (64MiB was -5.5%; probe smaller)
run fcm_vmem24 "$FCM --xla_tpu_scoped_vmem_limit_kib=24576"
# dot strength reduction off (affects conv-as-dot rewrites)
run fcm_no_dsr "$FCM --xla_tpu_enable_dot_strength_reduction=false"
# aggressive multi-level fusion cost model + latency hiding combo
run fcm_lhs "$FCM --xla_tpu_enable_latency_hiding_scheduler=true --xla_tpu_rwb_fusion=false"
# async host offload / prefetch distance on MSA
run fcm_msa "$FCM --xla_tpu_memory_limit_slack_slop_factor=95"
echo DONE >> "$LOG"
