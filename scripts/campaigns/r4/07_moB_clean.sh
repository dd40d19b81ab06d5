cd /root/repo
set -x
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_moB --seed 77 \
  --iters 1200 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 50
