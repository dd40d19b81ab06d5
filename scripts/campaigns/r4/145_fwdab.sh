cd /root/repo
set -x
# forward corner subsampling bench A/B (VERDICT r3 next #4a)
echo "== fwd_corners 8 (control) =="
BENCH_TRAIN_ONLY=1 timeout 900 python bench.py
echo "== fwd_corners 1 =="
BENCH_TRAIN_ONLY=1 BENCH_FWD_CORNERS=1 timeout 900 python bench.py
echo "== fwd_corners 1 + level_stride 2 =="
BENCH_TRAIN_ONLY=1 BENCH_FWD_CORNERS=1 BENCH_LEVEL_STRIDE=2 timeout 900 python bench.py
