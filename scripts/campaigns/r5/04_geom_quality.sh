cd /root/repo
set -x
# Table-geometry quality A/B (VERDICT r4 next #1b): L8/F4 and L4/F8 vs the
# reference L16/F2 at matched step count (1495 protocol: seed 5, 600 it).
# Equal-walltime arms are appended by a follow-up job once the
# 02_geom_bench speedups are on record (steps scaled by the measured
# ratio).  NB the L16/F2 control is shared with 03_tcull_quality's
# /tmp/ws_q_tc0 arm — not re-run here.
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q_g84 --seed 5 \
  --iters 600 --n_levels 8 --n_features 4 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q_g48 --seed 5 \
  --iters 600 --n_levels 4 --n_features 8 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
grep -H "eval\] PSNR" /tmp/ws_q_g*/log_ngp.txt /tmp/ws_q_tc0/log_ngp.txt 2>/dev/null || true
