cd /root/repo
set -x
export NGP_MAX_DISPATCH_CHUNK_BUDGET=512
# fresh-process joint gate + 100-msg attack sweep (crop-trained decoder)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/llff_scene_conv -O --wtmk_tcnn --workspace /tmp/ws_llff2_wm \
  --ckpt latest --test --attack_suite --n_test_attack 100 --n_test_bitacc 100 --bitacc_batch 8 \
  --message_dim 32 --num_rows 16 --num_cols 16 \
  --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 --density_thresh 10 \
  --infer_budget 256 --num_images_test 4
