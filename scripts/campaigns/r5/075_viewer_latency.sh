cd /root/repo
set -x
# viewer resolution/latency curve on the trained draw-C backbone (VERDICT
# r4 next #8): makes the "interactive via adaptive downscale" claim a table
timeout 1800 python scripts_dev/viewer_latency.py /tmp/mo_scene \
  --workspace /tmp/ws_moC --ckpt latest -O \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --infer_budget 128 --W 800 --H 800 --radius 1.9
