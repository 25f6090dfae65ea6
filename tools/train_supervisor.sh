#!/bin/bash
# Supervised phantom training: relaunches tools/train_phantom.py until it
# exits cleanly (0). The in-loop stall watchdog exits 42 on a wedged
# device/data pipeline; training resumes exactly from the last
# checkpoint. Pass env knobs (PH_*) through.
cd "$(dirname "$0")/.."
attempt=0
while true; do
  attempt=$((attempt + 1))
  echo "[supervisor] attempt ${attempt}: launching trainer" >&2
  python tools/train_phantom.py
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[supervisor] trainer finished cleanly" >&2
    exit 0
  fi
  echo "[supervisor] trainer exited rc=${rc}; restarting in 10 s" >&2
  sleep 10
done
