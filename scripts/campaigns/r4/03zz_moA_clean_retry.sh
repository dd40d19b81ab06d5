cd /root/repo
set -x
rm -rf /tmp/ws_moA
[ -d /tmp/mo_scene ] || python scripts_dev/make_multiobj_dataset.py /tmp/mo_scene --res 256 --views 60
python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_moA --seed 10 \
  --iters 2000 --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 25
python main_nerf.py /tmp/mo_scene -O --workspace /tmp/ws_moA --seed 10 \
  --test --mesh_resolution 128 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10
