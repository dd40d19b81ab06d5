cd /root/repo
set -x
# Table-geometry bench A/B (VERDICT r4 next #1b): same 32-feature encoding
# width, fewer levels — the engine is index-rate-bound (120-250 M idx/s
# regardless of table size, PERF.md round 3), so halving levels halves the
# dominant forward-gather AND backward-scatter index counts exactly, with
# zero estimator variance.  Reference geometry: 16 levels x 2 feats
# (hash_encoding.py:60-66).
echo "== L16 F2 (reference geometry, control) =="
BENCH_TRAIN_ONLY=1 timeout 900 python bench.py
echo "== L8 F4 =="
BENCH_TRAIN_ONLY=1 BENCH_LEVELS=8 BENCH_FEATURES=4 timeout 900 python bench.py
echo "== L4 F8 =="
BENCH_TRAIN_ONLY=1 BENCH_LEVELS=4 BENCH_FEATURES=8 timeout 900 python bench.py
echo "== L8 F4 + t_cull 1e-6 (compose the exact levers) =="
BENCH_TRAIN_ONLY=1 BENCH_LEVELS=8 BENCH_FEATURES=4 BENCH_T_CULL=1e-6 timeout 900 python bench.py
