#!/bin/bash
# Tunnel watcher: probe the TPU every ~2 min (the axon backend can either
# block forever or raise UNAVAILABLE while the tunnel is down — the probe is
# a disposable subprocess under timeout either way) and launch the given
# chip session script the moment a device answers.
#   usage: tools/chip_watch.sh tools/chip_session_r5c.sh /tmp/r5c.log
set -u
cd "$(dirname "$0")/.."
SESSION="${1:?session script}"
LOG="${2:?log path}"

while true; do
  if timeout 120 python -c \
      "import jax; d=jax.devices()[0]; assert d.platform != 'cpu', d; print(d)" \
      >>"$LOG" 2>&1; then
    echo "$(date +%T) tunnel up — launching $SESSION" >>"$LOG"
    bash "$SESSION" >>"$LOG" 2>&1
    echo "$(date +%T) session exited rc=$?" >>"$LOG"
    break
  fi
  echo "$(date +%T) tunnel still down" >>"$LOG"
  sleep 110
done
