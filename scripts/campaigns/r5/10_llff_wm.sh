cd /root/repo
set -x
export NGP_MAX_DISPATCH_CHUNK_BUDGET=512
CKPT=$(ls -v /tmp/ws_llff2/checkpoints/ngp_ep*.ckpt | tail -1)
# wm refresh on the retrained backbone, TRAINED THROUGH CROP (the one
# chance-level attack row, VERDICT r3 next #3: crop_50 0.488 -> target >=0.9)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/llff_scene_conv -O --wtmk_tcnn --workspace /tmp/ws_llff2_wm \
  --ckpt "$CKPT" --seed 10 --iters 1600 --message_dim 32 --num_rows 16 --num_cols 16 \
  --lambda_w 0.005 --lambda_i 1.0 --loss_w bce --lambda_msg_reg 0.01 \
  --distortion crop \
  --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 --density_thresh 10 \
  --infer_budget 256 --steps_per_dispatch 8 --save_interval 50 --eval_interval 100 \
  --n_test_bitacc 16 --num_images_test 2 --n_views 1
