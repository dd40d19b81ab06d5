#!/usr/bin/env bash
# Watermark 4 scenes concurrently — analog of the reference's multi-GPU run
# script (scripts/run_16b_32X32_clean_adv_attack_seed_0.sh): one process per
# scene. On a multi-chip TPU host, pin one chip per process via
# TPU_VISIBLE_CHIPS; on a single chip the jobs run sequentially.
set -e

SEED=${SEED:-0}
ITERS=${ITERS:-2400}
DIM=${DIM:-16}

run_scene () {
  local chip=$1 data=$2 ws=$3 ckpt=$4 extra=$5
  TPU_VISIBLE_CHIPS=$chip python main_nerf_wtmk.py "$data" -O --wtmk_tcnn \
    --workspace "$ws" --ckpt "$ckpt" --seed "$SEED" --iters "$ITERS" \
    --message_dim "$DIM" --num_rows 32 --num_cols 32 \
    --lambda_w 0.005 --lambda_i 1.0 --loss_w bce $extra &
}

run_scene 0 data/nerf_synthetic/hotdog ws_hotdog_wm ws_hotdog/checkpoints/ngp.ckpt \
  "--bound 1.0 --scale 0.8 --dt_gamma 0 --downscale 2"
run_scene 1 data/nerf_llff/fern ws_fern_wm ws_fern/checkpoints/ngp.ckpt \
  "--bound 1.0 --scale 0.8 --dt_gamma 0"
run_scene 2 data/360_v2/counter ws_counter_wm ws_counter/checkpoints/ngp.ckpt \
  "--scale 0.33 --dt_gamma 0"
run_scene 3 data/tanks/Family ws_family_wm ws_family/checkpoints/ngp.ckpt \
  "--scale 0.33 --downscale 4"

wait
