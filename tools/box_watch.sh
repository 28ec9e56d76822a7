#!/bin/sh
# Probe box health every 10 min and append to BENCH/box_health.log.
# Read the log before launching any scaling series: healthy =
# alu_s < 1.0 AND numpy_gbps >= 9.5 AND alu8_speedup >= 6 AND load1 < 2.
# Logs only — never auto-launches a bench (the series needs the box
# otherwise idle, so a human/agent decision gates it).
cd "$(dirname "$0")/.." || exit 1
while true; do
  python tools/box_probe.py >> BENCH/box_health.log 2>&1
  sleep 600
done
