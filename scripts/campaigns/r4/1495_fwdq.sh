cd /root/repo
set -x
# e2e quality A/B for forward corner subsampling (VERDICT r3 #4a):
# same seed/recipe, 600 iters, compare final eval PSNR
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_fwdq8 --seed 5 \
  --iters 600 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_fwdq1 --seed 5 \
  --iters 600 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --hash_fwd_corners 1 --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_fwdq1s2 --seed 5 \
  --iters 600 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --hash_fwd_corners 1 --hash_level_stride 2 \
  --steps_per_dispatch 8 --save_interval 100
grep -H "eval\] PSNR" /tmp/ws_fwdq*/log_ngp.txt 2>/dev/null || true
