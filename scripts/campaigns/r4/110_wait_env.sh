# the round-3 env clean run (pid 26847) is still live on the chip; hold the
# queue until it exits so we never double-dispatch
while kill -0 26847 2>/dev/null; do sleep 30; done
sleep 10
tail -5 /tmp/queue_logs/11_env_clean.log
ls -la /tmp/ws_env/checkpoints/ || exit 1
