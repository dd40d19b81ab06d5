cd /root/repo
set -x
# BASELINE config 4 redo: geometric stepping (ref main_nerf.py:40 dt_gamma
# default) fixes the dt_gamma-0 mean_occ~242 blowup that truncated evals at
# infer_budget 256 (first env attempt: clean eval 8.93 dB)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf.py /tmp/mo_env -O --workspace /tmp/ws_env2 --seed 10 \
  --iters 1200 --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 \
  --density_thresh 10 --infer_budget 512 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 50
