#!/bin/bash
set -u
cd "$(dirname "$0")/.."
B_PID=$(cat /tmp/chain_r5b.pid 2>/dev/null || echo 0)
while [ "$B_PID" != 0 ] && kill -0 "$B_PID" 2>/dev/null; do
  sleep 60
done
exec bash tools/chip_chain_r5c.sh
