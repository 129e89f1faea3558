#!/usr/bin/env bash
# Launch a CLI task on every worker of a Cloud TPU pod slice.
# Usage: ./launch_tpu_pod.sh <tpu-name> <zone> <task> [extra CLI args...]
# e.g.   ./launch_tpu_pod.sh vms-v5e-16 us-west4-1 egocentric \
#            --preset ego_timemamba_pretrain --epochs 5
#
# jax.distributed.initialize() auto-detects the pod topology on each
# worker; no coordinator/rank env vars are needed.
set -euo pipefail
TPU_NAME=$1; ZONE=$2; shift 2

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/video_mamba_suite_tpu && python -m video_mamba_suite_tpu.cli $*"
