cd /root/repo
set -x
# draw C: full 200-message ownership protocol + fresh-process quality
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo_scene -O --wtmk_tcnn --workspace /tmp/ws_moC_wm \
  --ckpt latest --test --n_test_bitacc 200 --bitacc_batch 8 \
  --message_dim 32 --num_rows 16 --num_cols 16 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 --num_images_test 2
tail -5 /tmp/ws_moC_wm/bitacc.txt 2>/dev/null || true
