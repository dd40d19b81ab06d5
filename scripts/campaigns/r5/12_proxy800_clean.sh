cd /root/repo
set -x
# hotdog-scale proxy (VERDICT r4 next #3): 800x800 rich scene, the
# reference recipe's image scale (README.md:45 trains hotdog at 800x800).
# Clean stage runs the PER-STEP path (no --steps_per_dispatch): the
# 800x800 view pool is too large to preload into HBM through the relay;
# host collate ships only the 4096 sampled pixels per step.
[ -d /tmp/mo800 ] || python scripts_dev/make_multiobj_dataset.py /tmp/mo800 --res 800 --views 60 --rich
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf.py /tmp/mo800 -O --workspace /tmp/ws_mo800 --seed 11 \
  --iters 1500 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --save_interval 100 --num_images_test 2
