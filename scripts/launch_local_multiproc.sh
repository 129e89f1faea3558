#!/usr/bin/env bash
# Two-process CPU launch on ONE machine: smoke-checks the multi-host path
# (coordinator handshake, per-process sampler shards, global-batch
# assembly) without pod hardware. Each process simulates 2 devices, so
# the 'data' mesh axis spans 4 devices across 2 processes.
set -euo pipefail
PORT=${PORT:-8476}
CMD=${*:-"-m video_mamba_suite_tpu.cli tas --synthetic --epochs 1 \
  --set train.batch_size=4 train.use_mesh=true"}

export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=2"
export VMS_COORDINATOR="localhost:${PORT}"
export VMS_NUM_PROCESSES=2

VMS_PROCESS_ID=0 python $CMD &
P0=$!
VMS_PROCESS_ID=1 python $CMD &
P1=$!
trap 'kill $P0 $P1 2>/dev/null || true' EXIT
wait $P0; wait $P1
echo "multihost smoke OK"
