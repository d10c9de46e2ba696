#!/bin/bash
# Waits for the main r5 chain process to exit, then runs the r5b
# follow-on chain (never two chains on the chip at once).
set -u
cd "$(dirname "$0")/.."
MAIN_PID=$(cat /tmp/chain_r5.pid 2>/dev/null || echo 0)
while [ "$MAIN_PID" != 0 ] && kill -0 "$MAIN_PID" 2>/dev/null; do
  sleep 60
done
exec bash tools/chip_chain_r5b.sh
