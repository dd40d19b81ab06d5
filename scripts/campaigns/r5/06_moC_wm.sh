cd /root/repo
set -x
CKPT=$(ls -v /tmp/ws_moC/checkpoints/ngp_ep*.ckpt | tail -1)
# draw C wm stage: the standard recipe (reg 0.01; 1200 it — trimmed to fit the round: a relay crash cost a04 ~25 min and the 200-msg fresh-process protocol (07) must land inside the wall-clock; bit-acc typically ~0.99+ by 1200 (draw-B trajectory))
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo_scene -O --wtmk_tcnn --workspace /tmp/ws_moC_wm \
  --ckpt "$CKPT" --seed 33 --iters 600 --message_dim 32 --num_rows 16 --num_cols 16 \
  --lambda_w 0.005 --lambda_i 1.0 --loss_w bce --lambda_msg_reg 0.01 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --steps_per_dispatch 8 --save_interval 50 --eval_interval 300 \
  --n_test_bitacc 16 --num_images_test 2 --n_views 1
