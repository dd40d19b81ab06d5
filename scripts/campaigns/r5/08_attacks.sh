cd /root/repo
set -x
# named-attack sweep at 100 msgs/attack (VERDICT r4 next #2 / r3 #6) on the
# draw-C model (r4 planned this on draw A; its /tmp workspace did not
# survive the round boundary — same recipe, same protocol scale)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo_scene -O --wtmk_tcnn --workspace /tmp/ws_moC_wm \
  --ckpt latest --test --attack_suite --n_test_attack 100 --n_test_bitacc 20 \
  --bitacc_batch 8 --message_dim 32 --num_rows 16 --num_cols 16 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 --num_images_test 0
