cd /root/repo
set -x
# per-component breakdown of the round-4 subsampled step (40k rays/s point)
STOCH=1 COMPACT=0.25 FWD_CORNERS=1 LEVEL_STRIDE=2 timeout 1200 python scripts_dev/profile_bench.py
echo "== exact-step comparison =="
STOCH=1 COMPACT=0.25 timeout 1200 python scripts_dev/profile_bench.py
