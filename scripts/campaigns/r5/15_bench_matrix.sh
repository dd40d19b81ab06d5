cd /root/repo
set -x
# bench matrix + transport-free render rate (VERDICT r4 next #4)
BENCH_MATRIX=1 timeout 3000 python bench.py
