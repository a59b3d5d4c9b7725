#!/usr/bin/env bash
# Fan a command out to every worker of a TPU VM pod slice (the reference's
# tpu_connect.sh role, without tmux): every worker runs the same SPMD script;
# jax.distributed auto-detects coordinates from the TPU metadata.
#
#   scripts/tpu_launch.sh <tpu-name> <zone> -- python -m distil_whisper_tpu.cli.run_distillation ...
set -euo pipefail
TPU_NAME=${1:?usage: tpu_launch.sh <tpu-name> <zone> -- <command...>}
ZONE=${2:?}
shift 3  # drop name, zone, --
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd $(pwd) && $*"
