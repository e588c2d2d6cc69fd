#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh twin).
#
# The reference wraps torch.distributed.launch (one process per GPU, NCCL);
# JAX on TPU pods runs ONE process per host and discovers peers through the
# TPU runtime — jax.distributed.initialize() picks up coordinator/rank from
# the environment on Cloud TPU VMs, so the launcher is just environment
# plumbing + the trainer CLI.
#
# Usage:
#   NNODES=4 NODE_RANK=$i COORDINATOR=host0:8476 \
#     bash scripts/dist_train.sh CONFIG DATA_ROOT [trainer args...]
set -e

CONFIG=$1
DATA_ROOT=$2
shift 2

export JAX_COORDINATOR_ADDRESS=${COORDINATOR:-localhost:8476}
export JAX_NUM_PROCESSES=${NNODES:-1}
export JAX_PROCESS_ID=${NODE_RANK:-0}

python -m peanut_tpu.cli.train_prediction_model \
    --config "$CONFIG" --data_root "$DATA_ROOT" --distributed 1 "$@"
