cd /root/repo
set -x
# t_cull bench A/B (VERDICT r4 next #1a): exact population lever — samples
# entering at proxy T < t_cull have exactly zero weight/gradient in the
# composite (measured 46% of samples on the trained headline scene,
# scripts_dev/transmittance_probe.py).  Default-path (stochastic grads,
# compact 0.25) sweep.
echo "== t_cull 0 (control) =="
BENCH_TRAIN_ONLY=1 timeout 900 python bench.py
echo "== t_cull 1e-6 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-6 timeout 900 python bench.py
echo "== t_cull 1e-5 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 timeout 900 python bench.py
echo "== t_cull 1e-4 (= composite T_thresh, no buffer) =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-4 timeout 900 python bench.py
