cd /root/repo
python scripts_dev/level_sample_probe.py
echo "== bench stride=2 (prefilter default on) =="
BENCH_LEVEL_STRIDE=2 BENCH_TRAIN_ONLY=1 python bench.py
echo "== bench stride=4 =="
BENCH_LEVEL_STRIDE=4 BENCH_TRAIN_ONLY=1 python bench.py
echo "== bench stride=1 control =="
BENCH_TRAIN_ONLY=1 python bench.py
