#!/usr/bin/env bash
# ViViM-Tiny Kinetics-400 finetune — the reference's
# exp/k400/vivim_tiny/run_f16x224.sh (srun, 16 GPUs) equivalent.
# Run the same command on every pod worker (see launch_tpu_pod.sh).
set -euo pipefail
python -m video_mamba_suite_tpu.cli recognition \
  --preset recognition_k400_vivim_tiny \
  --epochs "${EPOCHS:-30}" \
  --ckpt "${CKPT_DIR:-/tmp/k400_vivim_ckpt}" \
  --set train.use_mesh=true "$@"
