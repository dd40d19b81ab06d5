cd /root/repo
set -x
export NGP_MAX_DISPATCH_CHUNK_BUDGET=512
[ -f /tmp/llff_scene_conv/transforms.json ] || {
  python scripts_dev/make_llff_dataset.py /tmp/llff_scene_conv --res 256 --views 30
  python scripts/llff2nerf.py /tmp/llff_scene_conv
}
# LLFF backbone retrain (VERDICT r4 next #2 / r3 #5): 1.5x-mean budget
# adaptation + the reference's forward-facing dt_gamma default
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf.py /tmp/llff_scene_conv -O --workspace /tmp/ws_llff2 --seed 10 \
  --iters 1200 --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 \
  --density_thresh 10 --infer_budget 256 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 50
