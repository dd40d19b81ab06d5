cd /root/repo
python scripts_dev/marginal_probe.py
echo "=== probe2 ==="
python scripts_dev/marginal_probe2.py
echo "=== probe3 (stochastic, compact 0.25) ==="
python scripts_dev/marginal_probe3.py
