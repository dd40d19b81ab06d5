cd /root/repo
set -x
# proxy800 joint gate: 200-message protocol + fresh-process quality
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo800 -O --wtmk_tcnn --workspace /tmp/ws_mo800_wm \
  --ckpt latest --test --n_test_bitacc 200 --bitacc_batch 8 --downscale 2 \
  --message_dim 32 --num_rows 16 --num_cols 16 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 --num_images_test 2
tail -5 /tmp/ws_mo800_wm/bitacc.txt 2>/dev/null || true
