cd /root/repo
set -x
# Converged-regime micro-sweep: at the adapted point (budget 32, mean
# occupied ~19-25/ray) the march's fine-candidate population is set by
# group_budget (default max(64, budget//2) = 64 groups x 4 = 256
# candidates/ray — 8-13x the occupied count), and the coarse compaction
# buckets can over-provision near bucket edges.  Probe both knobs.
echo "== adapted + t_cull 1e-5 (reference point) =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 timeout 1200 python bench.py
echo "== + march group_budget 32 (128 candidates/ray) =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 NGP_MARCH_GROUP_BUDGET=32 timeout 1200 python bench.py
echo "== + march group_budget 16 (64 candidates/ray) =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 NGP_MARCH_GROUP_BUDGET=16 timeout 1200 python bench.py
echo "== budget 32 + compact 0.75 (fill 0.59 -> 1.27x headroom) =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 BENCH_BUDGET=32 BENCH_COMPACT=0.75 timeout 1200 python bench.py
echo "== budget 32 + compact 0.75 + group_budget 16 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 BENCH_BUDGET=32 BENCH_COMPACT=0.75 NGP_MARCH_GROUP_BUDGET=16 timeout 1200 python bench.py
