cd /root/repo
set -x
timeout 1200 python bench.py
