#!/bin/bash
# Multi-host (multi-process) training launch — one process per host.
#
# The reference's only scale-out is shell-level job parallelism (one scene
# per GPU, scripts/run_16b_32X32_clean_adv_attack_seed_0.sh); this framework
# runs ONE training job across hosts: every process executes the same
# command, jax.distributed forms the group (DCN between hosts, ICI within),
# and GSPMD shards the ray batch over the union of all chips
# (nerf_signature_tpu/parallel/multihost.py).
#
# Usage on each host i of N (host 0 doubles as coordinator):
#   bash scripts/run_multihost.sh <coordinator_host:port> <N> <i> \
#       <data_dir> <workspace> [extra flags...]
#
# On TPU pods the runtime usually provides the topology and the three env
# vars may be omitted entirely (jax auto-detects); this script is the
# explicit form that also works for CPU/GPU clusters (Gloo collectives).
set -eu
COORD=$1; NPROC=$2; PROC_ID=$3; DATA=$4; WS=$5; shift 5

NGP_COORDINATOR=$COORD NGP_NUM_PROCESSES=$NPROC NGP_PROCESS_ID=$PROC_ID \
python main_nerf.py "$DATA" --workspace "$WS" \
    --fp16 --cuda_ray --preload --devices 0 \
    --steps_per_dispatch 8 "$@"
