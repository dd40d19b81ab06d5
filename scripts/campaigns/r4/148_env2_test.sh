cd /root/repo
set -x
export NGP_MAX_DISPATCH_CHUNK_BUDGET=512
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo_env -O --wtmk_tcnn --workspace /tmp/ws_env2_wm \
  --ckpt latest --test --n_test_bitacc 96 --bitacc_batch 8 \
  --message_dim 48 --num_rows 16 --num_cols 16 \
  --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 --density_thresh 10 \
  --infer_budget 256 --num_images_test 4
tail -5 /tmp/ws_env2_wm/bitacc.txt 2>/dev/null || true
