cd /root/repo
set -x
# FINAL clean bench-adapt arms: converged warmup + density_thresh 10 +
# the 1.3x-headroom finer compaction buckets (037 measured the 1.5x rule
# parking compaction OFF at fill 0.39: 15.9k rays/s).
# bench now picks the budget/compaction buckets the trainer's own
# auto-adaptation picks (--compact_frac -1 and the symmetric budget
# adaptation are the product defaults).  Three arms: adapted exact-default,
# adapted + t_cull (pending the 03 quality gate), and the historical fixed
# protocol for continuity.
echo "== adapted, t_cull 0 =="
BENCH_TRAIN_ONLY=1 timeout 1200 python bench.py
echo "== adapted, t_cull 1e-4 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-4 timeout 1200 python bench.py
echo "== adapted, t_cull 1e-5 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 timeout 1200 python bench.py
echo "== historical fixed protocol (BENCH_ADAPT=0) =="
BENCH_TRAIN_ONLY=1 BENCH_ADAPT=0 timeout 1200 python bench.py
