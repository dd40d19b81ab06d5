cd /root/repo
echo "== prefilter OFF (r02 configuration) =="
NGP_MARCH_PREFILTER=0 BENCH_TRAIN_ONLY=1 python bench.py
echo "== prefilter ON (default) =="
BENCH_TRAIN_ONLY=1 python bench.py
echo "== prefilter ON, group_budget 64 =="
NGP_MARCH_GROUP_BUDGET=64 BENCH_TRAIN_ONLY=1 python bench.py
echo "== prefilter ON, group 8 gb 64 =="
NGP_MARCH_GROUP=8 NGP_MARCH_GROUP_BUDGET=64 BENCH_TRAIN_ONLY=1 python bench.py
echo "== all-modes, prefilter ON =="
python bench.py
