cd /root/repo
set -x
# Equal-WALLTIME table-geometry arms (follow-up to 04_geom_quality's
# matched-step arms): steps scaled by the measured bench ratios
# (r5/02_geom_bench: L8F4 1.22x -> 732 it, L4F8 1.52x -> 912 it vs the
# 600-it L16F2 control), the same protocol the r4 fwd-corners/stride
# pricing used (1495/1497).  The control is /tmp/ws_q2_tc0 (a01 arm 1).
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_w_g84 --seed 5 \
  --iters 732 --n_levels 8 --n_features 4 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 200
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_w_g48 --seed 5 \
  --iters 912 --n_levels 4 --n_features 8 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 200
grep -H "eval\] PSNR" /tmp/ws_w_g*/log_ngp.txt 2>/dev/null || true
