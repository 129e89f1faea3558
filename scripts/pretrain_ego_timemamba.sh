#!/usr/bin/env bash
# CLIP-TimeMamba Ego4D-style pretraining — the reference's
# scripts/pretrain/ (srun, 2 nodes x 8 GPUs) equivalent. Run the same
# command on every pod worker (see launch_tpu_pod.sh); single host works
# unchanged.
set -euo pipefail
python -m video_mamba_suite_tpu.cli egocentric \
  --preset ego_timemamba_pretrain \
  --epochs "${EPOCHS:-5}" \
  --ckpt "${CKPT_DIR:-/tmp/ego_timemamba_ckpt}" \
  --set train.use_mesh=true "$@"
