cd /root/repo
set -x
[ -d /tmp/mo_env ] || python scripts_dev/make_multiobj_dataset.py /tmp/mo_env --res 256 --views 60 --env
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- python main_nerf.py /tmp/mo_env -O --workspace /tmp/ws_env --seed 10 \
  --iters 1200 --bound 2.0 --scale 0.33 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 50
