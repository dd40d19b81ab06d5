cd /root/repo
set -x
export NGP_MAX_DISPATCH_CHUNK_BUDGET=512
# LLFF backbone retrain with the 1.5x-mean budget adaptation + the
# reference's forward-facing dt_gamma default (VERDICT r3 next #5)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf.py /tmp/llff_scene_conv -O --workspace /tmp/ws_llff2 --seed 10 \
  --iters 1200 --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 \
  --density_thresh 10 --infer_budget 256 \
  --stochastic_hash_grad --steps_per_dispatch 8 --save_interval 50
