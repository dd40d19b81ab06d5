cd /root/repo
set -x
# equal-WALLTIME arms: fwd-1 at 1.48x steps, fwd-1+stride-2 at 1.79x steps
# (same seed/recipe as 1495; compare to exact-600's 24.20 dB)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_fwdq1b --seed 5 \
  --iters 890 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --hash_fwd_corners 1 --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_fwdq1s2b --seed 5 \
  --iters 1075 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --hash_fwd_corners 1 --hash_level_stride 2 \
  --steps_per_dispatch 8 --save_interval 100
grep -H "eval\] PSNR" /tmp/ws_fwdq1b/log_ngp.txt /tmp/ws_fwdq1s2b/log_ngp.txt || true
