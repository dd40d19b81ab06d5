cd /root/repo
set -x
CKPT=$(ls -v /tmp/ws_mo800/checkpoints/ngp_ep*.ckpt | tail -1)
# wm stage at the hotdog recipe's downscale 2 (400x400 pseudo-GT pool /
# key image; ref README.md:45: 32-bit, 1000 it, lambda_w 0.005, BCE, ds 2)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo800 -O --wtmk_tcnn --workspace /tmp/ws_mo800_wm \
  --ckpt "$CKPT" --seed 11 --iters 1500 --downscale 2 \
  --message_dim 32 --num_rows 16 --num_cols 16 \
  --lambda_w 0.005 --lambda_i 1.0 --loss_w bce --lambda_msg_reg 0.01 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --steps_per_dispatch 8 --save_interval 50 --eval_interval 200 \
  --n_test_bitacc 16 --num_images_test 2 --n_views 1
