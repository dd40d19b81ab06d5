set -x
cd /root/repo
BALL_RES=128 python scripts_dev/make_ball_dataset.py /tmp/ball128
python main_nerf.py /tmp/ball128 --workspace /tmp/ws_b128 --cpu --cuda_ray \
  --iters 300 --grid_size 64 --num_rays 1024 --bound 1.0 --scale 1.0 \
  --dt_gamma 0 --min_near 0.05 --density_thresh 0.01 --train_budget 64 \
  --infer_budget 96 --max_steps 256 --steps_per_dispatch 25 --save_interval 4
CKPT=$(ls -v /tmp/ws_b128/checkpoints/ngp_ep*.ckpt | tail -1)
for D in crop rotation scaling; do
  python main_nerf_wtmk.py /tmp/ball128 --workspace /tmp/ws_b128_wm_$D --cpu \
    --cuda_ray --wtmk_tcnn --ckpt "$CKPT" --iters 1200 --grid_size 64 \
    --num_rays 1024 --bound 1.0 --scale 1.0 --dt_gamma 0 --min_near 0.05 \
    --density_thresh 0.01 --train_budget 64 --infer_budget 96 --max_steps 256 \
    --message_dim 32 --num_rows 16 --num_cols 16 --lambda_w 0.05 \
    --distortion $D --steps_per_dispatch 100 --eval_interval 4 \
    --save_interval 4 --n_test_bitacc 8 --num_images_test 1 --n_views 1
  python main_nerf_wtmk.py /tmp/ball128 --workspace /tmp/ws_b128_wm_$D --cpu \
    --cuda_ray --wtmk_tcnn --ckpt latest --test --grid_size 64 \
    --bound 1.0 --scale 1.0 --dt_gamma 0 --min_near 0.05 \
    --density_thresh 0.01 --train_budget 64 --infer_budget 96 --max_steps 256 \
    --message_dim 32 --num_rows 16 --num_cols 16 \
    --attack_suite --n_test_attack 10 --n_test_bitacc 20 \
    --num_images_test 1 --n_views 1
  echo "=== arm $D complete ==="
done
echo CPU_ROBUST_DONE
