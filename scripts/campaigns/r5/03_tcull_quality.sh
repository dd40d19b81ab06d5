cd /root/repo
set -x
# t_cull quality A/B (the 1495 protocol: same seed/recipe, 600 iters,
# final eval PSNR; seed 5 = the r4 fwdq control's seed, so the exact arm
# re-measures the 24.20 dB control on this round's chip state).
# t_cull drops only samples whose composite weight AND gradient are exactly
# zero (modulo the decayed-max proxy's conservatism), so matched-step PSNR
# parity is the claim under test; equal-walltime can then only improve on
# it (the culled step is strictly faster).
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q_tc0 --seed 5 \
  --iters 600 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q_tc6 --seed 5 \
  --iters 600 --t_cull 1e-6 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q_tc4 --seed 5 \
  --iters 600 --t_cull 1e-4 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
grep -H "eval\] PSNR" /tmp/ws_q_tc*/log_ngp.txt 2>/dev/null || true
