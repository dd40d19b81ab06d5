cd /root/repo
set -x
# t_cull quality gate, SECOND pass — on the FIXED provisioning stack
# (raw-budget adaptation + survivor-fill compaction + fog gate; see
# PERF.md "Quality gate FAILED for survivor-provisioned t_cull").
# Matched-step 1495 protocol: seed 5, 600 it, same scene as every
# BENCH_r0N quality arm.  The exact control re-measures the 24.20 dB
# record (reproduced twice: r4 fwdq control, r5/03 arm 1); re-run here
# so all three arms share one chip state.
[ -d /tmp/mo_scene ] || python scripts_dev/make_multiobj_dataset.py /tmp/mo_scene --res 256 --views 60
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q2_tc0 --seed 5 \
  --iters 600 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q2_tc4 --seed 5 \
  --iters 600 --t_cull 1e-4 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 2 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_q2_tc5 --seed 5 \
  --iters 600 --t_cull 1e-5 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 100
grep -H "eval\] PSNR" /tmp/ws_q2_tc*/log_ngp.txt 2>/dev/null || true
grep -H "adapt\|budget" /tmp/ws_q2_tc4/log_ngp.txt 2>/dev/null | tail -20 || true
