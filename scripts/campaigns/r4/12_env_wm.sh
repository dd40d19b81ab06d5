cd /root/repo
set -x
CKPT=$(ls -v /tmp/ws_env/checkpoints/ngp_ep*.ckpt | tail -1)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- python main_nerf_wtmk.py /tmp/mo_env -O --wtmk_tcnn --workspace /tmp/ws_env_wm \
  --ckpt "$CKPT" --seed 10 --iters 1000 --message_dim 48 --num_rows 16 --num_cols 16 \
  --lambda_w 0.005 --lambda_i 1.0 --loss_w bce \
  --bound 2.0 --scale 0.33 --dt_gamma 0 --density_thresh 10 \
  --steps_per_dispatch 8 --save_interval 50 --eval_interval 50 \
  --n_test_bitacc 16 --num_images_test 2 --n_views 1
