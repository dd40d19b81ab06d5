cd /root/repo
set -x
# Bench ladder re-measurement on the FIXED provisioning stack (the 039
# ladder's t_cull arms rode the survivor-provisioned budget-32 point the
# quality gate rejected; superseded — PERF.md).  bench.py now provisions
# the budget from the RAW pre-cull mean, the compaction bucket from the
# survivor fill, and adapts the march group budget; these arms measure
# exactly what the product trainer's auto-adaptation configures.
echo "== adapted, t_cull 0 (exact default) =="
BENCH_TRAIN_ONLY=1 timeout 1800 python bench.py
echo "== adapted, t_cull 1e-4 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-4 timeout 1800 python bench.py
echo "== adapted, t_cull 1e-5 =="
BENCH_TRAIN_ONLY=1 BENCH_T_CULL=1e-5 timeout 1800 python bench.py
echo "== historical fixed protocol (continuity check) =="
# BENCH_T_CULL=0 pinned for the record: the r01-r04 protocol is exact at
# fixed 128/0.25 shapes (BENCH_ADAPT=0 already defaults the cull off)
BENCH_TRAIN_ONLY=1 BENCH_ADAPT=0 BENCH_T_CULL=0 timeout 1800 python bench.py
