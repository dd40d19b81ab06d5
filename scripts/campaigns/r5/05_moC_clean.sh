cd /root/repo
set -x
[ -d /tmp/mo_scene ] || python scripts_dev/make_multiobj_dataset.py /tmp/mo_scene --res 256 --views 60
# draw C backbone (seed 33) — completes the >=3-draw robustness table
# (VERDICT r4 next #2); same clean recipe as draws A/B
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_moC --seed 33 \
  --iters 1200 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 50
