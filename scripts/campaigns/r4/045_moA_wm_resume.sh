cd /root/repo
set -x
CKPT=$(ls -v /tmp/ws_moA/checkpoints/ngp_ep*.ckpt | tail -1)
python main_nerf_wtmk.py /tmp/mo_scene -O --wtmk_tcnn --workspace /tmp/ws_moA_wm \
  --ckpt "$CKPT" --seed 10 --iters 2000 --message_dim 32 --num_rows 16 --num_cols 16 \
  --lambda_w 0.005 --lambda_i 1.0 --loss_w bce --lambda_msg_reg 0.01 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 \
  --steps_per_dispatch 8 --save_interval 25 --eval_interval 25 \
  --n_test_bitacc 16 --num_images_test 2 --n_views 1
# 200-message ownership protocol (VERDICT #4) + fresh-process joint gate
python main_nerf_wtmk.py /tmp/mo_scene -O --wtmk_tcnn --workspace /tmp/ws_moA_wm \
  --ckpt latest --test --n_test_bitacc 200 --bitacc_batch 8 \
  --message_dim 32 --num_rows 16 --num_cols 16 \
  --bound 1.0 --scale 1.0 --dt_gamma 0 --density_thresh 10 --num_images_test 4
tail -5 /tmp/ws_moA_wm/bitacc.txt 2>/dev/null || true
