cd /root/repo
set -x
# t_cull harvest sweep: the 01 A/B showed t_cull is ~flat at FIXED
# compact_frac 0.25 — static shapes mean the packed field buffer doesn't
# shrink when samples are culled.  The harvest needs compact_frac (and the
# march budget) to follow the culled population, exactly what the trainer's
# auto-adaptation does between compiles.  Sweep the static buckets here.
echo "== control: t_cull 0, compact 0.25, budget 128 =="
BENCH_TRAIN_ONLY=1 timeout 900 python bench.py
echo "== t_cull 1e-6, compact 0.125 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-6 BENCH_COMPACT=0.125 timeout 900 python bench.py
echo "== t_cull 1e-4, compact 0.125 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-4 BENCH_COMPACT=0.125 timeout 900 python bench.py
echo "== t_cull 1e-4, compact 0.0625 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-4 BENCH_COMPACT=0.0625 timeout 900 python bench.py
echo "== t_cull 1e-4, compact 0.125, budget 64 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-4 BENCH_COMPACT=0.125 BENCH_BUDGET=64 timeout 900 python bench.py
echo "== control at budget 64 (isolate the budget term) =="
BENCH_TRAIN_ONLY=1 BENCH_BUDGET=64 timeout 900 python bench.py
