#!/bin/bash
# Serial TPU job queue: runs /tmp/tpu_queue/*.sh in lexical order, one at a
# time (the tunneled worker tolerates exactly one job), logging to
# /tmp/queue_logs/<name>.log and archiving to /tmp/tpu_queue/done/.
# Touch /tmp/tpu_queue/STOP to exit when the queue drains;
# /tmp/tpu_queue/PAUSE to hold between jobs (e.g. to run a bench A/B).
QDIR=${QDIR:-/tmp/tpu_queue}
LOGS=${LOGS:-/tmp/queue_logs}
mkdir -p "$QDIR" "$QDIR/done" "$LOGS"
while true; do
  if [ -f "$QDIR/PAUSE" ]; then sleep 15; continue; fi
  job=$(ls "$QDIR"/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    [ -f "$QDIR/STOP" ] && { echo "[queue] drained + STOP"; exit 0; }
    sleep 15
    continue
  fi
  name=$(basename "$job" .sh)
  echo "[queue] $(date +%H:%M:%S) start $name" | tee -a "$LOGS/queue.log"
  timeout "${JOB_TIMEOUT:-10800}" bash "$job" > "$LOGS/$name.log" 2>&1
  rc=$?
  echo "[queue] $(date +%H:%M:%S) done  $name rc=$rc" | tee -a "$LOGS/queue.log"
  mv "$job" "$QDIR/done/$name.sh"
  echo $rc > "$QDIR/done/$name.rc"
done
