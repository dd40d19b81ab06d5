cd /root/repo
set -x
# dense-accumulation backward mechanism probe (VERDICT r4 next #1c):
# scatter vs one-hot MXU matmul at dense-coarse row counts + joint-scatter
# level-count scaling (headroom for removing levels by any mechanism)
timeout 1800 python scripts_dev/dense_bwd_probe.py
echo "== uncompacted population =="
PROBE_M=524288 timeout 1800 python scripts_dev/dense_bwd_probe.py
