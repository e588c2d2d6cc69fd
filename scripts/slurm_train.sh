#!/usr/bin/env bash
# SLURM training launcher (reference tools/slurm_train.sh twin).
#
# srun gives each task a rank/host; jax.distributed.initialize() consumes
# the coordinator env the same way dist_train.sh sets it.
#
# Usage: PARTITION=p JOB_NAME=j NNODES=4 bash scripts/slurm_train.sh CONFIG DATA_ROOT [args...]
set -e

PARTITION=${PARTITION:-dev}
JOB_NAME=${JOB_NAME:-peanut_tpu}
NNODES=${NNODES:-1}
CONFIG=$1
DATA_ROOT=$2
shift 2

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$NNODES" \
    --ntasks="$NNODES" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    bash -c 'JAX_COORDINATOR_ADDRESS=$(scontrol show hostnames $SLURM_JOB_NODELIST | head -n1):8476 \
        JAX_NUM_PROCESSES=$SLURM_NTASKS JAX_PROCESS_ID=$SLURM_PROCID \
        python -m peanut_tpu.cli.train_prediction_model \
            --config '"$CONFIG"' --data_root '"$DATA_ROOT"' --distributed 1 '"$*"
