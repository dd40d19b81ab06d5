#!/bin/bash
# Drives the .claude/skills/verify recipe end-to-end on CPU.
# Usage: bash scripts_dev/run_verify.sh [tag]   (workspaces under /tmp/verify_<tag>)
set -e
TAG=${1:-r3}
ROOT=/tmp/verify_$TAG
rm -rf $ROOT && mkdir -p $ROOT
cd /root/repo

echo "=== [1/6] dataset"
python scripts_dev/make_ball_dataset.py $ROOT/ball_scene

echo "=== [2/6] clean training"
python main_nerf.py $ROOT/ball_scene --workspace $ROOT/ws --cpu --cuda_ray \
  --iters 120 --grid_size 32 --num_rays 512 --bound 1.0 --scale 1.0 \
  --dt_gamma 0 --min_near 0.05 --density_thresh 0.01 --train_budget 64 \
  --infer_budget 96 --max_steps 256

echo "=== [3/6] test mode + mesh"
python main_nerf.py $ROOT/ball_scene --workspace $ROOT/ws --cpu --cuda_ray \
  --test --grid_size 32 --bound 1.0 --scale 1.0 --dt_gamma 0 \
  --min_near 0.05 --density_thresh 0.01 --infer_budget 96 --max_steps 256 \
  --mesh_resolution 64
ls $ROOT/ws/results/*.png > /dev/null
test -s $ROOT/ws/mesh.ply

echo "=== [4/6] watermark stage"
CKPT=$(ls $ROOT/ws/checkpoints/ngp_ep*.ckpt | tail -1)
python main_nerf_wtmk.py $ROOT/ball_scene --workspace $ROOT/ws_wm --cpu \
  --cuda_ray --wtmk_tcnn --ckpt $CKPT \
  --iters 30 --grid_size 32 --num_rays 256 --bound 1.0 --scale 1.0 \
  --dt_gamma 0 --min_near 0.05 --density_thresh 0.01 --train_budget 64 \
  --infer_budget 96 --max_steps 256 --message_dim 4 --num_rows 4 \
  --num_cols 4 --lambda_w 0.02 --eval_interval 3 --save_interval 3 \
  --num_images_test 2 --n_views 1
test -f $ROOT/ws_wm/key_poses.npy
test -f $ROOT/ws_wm/key_blocks.npy

echo "=== [5/6] ownership verification mode"
python main_nerf_wtmk.py $ROOT/ball_scene --workspace $ROOT/ws_wm --cpu \
  --cuda_ray --wtmk_tcnn --ckpt latest --test --distortion noise \
  --grid_size 32 --num_rays 256 --bound 1.0 --scale 1.0 \
  --dt_gamma 0 --min_near 0.05 --density_thresh 0.01 --train_budget 64 \
  --infer_budget 96 --max_steps 256 --message_dim 4 --num_rows 4 \
  --num_cols 4 --n_views 1 --n_test_bitacc 5 --num_images_test 2

echo "=== [6/6] graft entries"
python -c "import jax; jax.config.update('jax_platforms','cpu');
import __graft_entry__ as g; fn,a=g.entry(); jax.jit(fn)(*a)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "
import jax; jax.config.update('jax_platforms','cpu');
import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "VERIFY_OK"
