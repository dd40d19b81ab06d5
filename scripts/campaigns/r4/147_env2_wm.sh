cd /root/repo
set -x
CKPT=$(ls -v /tmp/ws_env2/checkpoints/ngp_ep*.ckpt | tail -1)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo_env -O --wtmk_tcnn --workspace /tmp/ws_env2_wm \
  --ckpt "$CKPT" --seed 10 --iters 1200 --message_dim 48 --num_rows 16 --num_cols 16 \
  --lambda_w 0.005 --lambda_i 1.0 --loss_w bce --lambda_msg_reg 0.01 \
  --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 --density_thresh 10 \
  --infer_budget 512 --steps_per_dispatch 8 --save_interval 50 --eval_interval 100 \
  --n_test_bitacc 16 --num_images_test 2 --n_views 1
