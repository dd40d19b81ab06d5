cd /root/repo
set -x
# Complete draw A's 2000-iter recipe AS WRITTEN (r3+r4 both died at exactly
# step 984 without the watchdog — deterministic relay/worker failure given
# identical dispatch history; the resume guard + watchdog is the designed
# mitigation).  eval_interval 100 changes the dispatch pattern; resume
# starts from the step-800 ring ckpt in the workspace.
CKPT=$(ls -v /tmp/ws_moA/checkpoints/ngp_ep*.ckpt | tail -1)
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 4 -- \
  python main_nerf_wtmk.py /tmp/mo_scene -O --wtmk_tcnn --workspace /tmp/ws_moA_wm \
  --ckpt "$CKPT" --seed 10 --iters 2000 --message_dim 32 --num_rows 16 --num_cols 16 \
  --lambda_w 0.005 --lambda_i 1.0 --loss_w bce --lambda_msg_reg 0.01 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --steps_per_dispatch 8 --save_interval 50 --eval_interval 100 \
  --n_test_bitacc 16 --num_images_test 2 --n_views 1
# fresh-process 200-message protocol on the COMPLETED model
python scripts/train_watchdog.py --stall-timeout 900 --max-restarts 3 -- \
  python main_nerf_wtmk.py /tmp/mo_scene -O --wtmk_tcnn --workspace /tmp/ws_moA_wm \
  --ckpt latest --test --n_test_bitacc 200 --bitacc_batch 8 \
  --message_dim 32 --num_rows 16 --num_cols 16 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 --num_images_test 4
