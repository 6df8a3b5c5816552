#!/bin/bash
# Poll the axon tunnel; when jax.devices() answers, run the queued
# measurement battery (battery_r2c.sh) once and exit. Probe is a
# subprocess with a hard timeout because a down tunnel makes
# `import jax` hang in sitecustomize register().
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tunnel_watch.log
echo "[watch] start $(date)" >> "$LOG"
while true; do
  if timeout 120 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "[watch] tunnel UP $(date) — running battery" >> "$LOG"
    bash benchmarks/battery_r2c.sh >> "$LOG" 2>&1
    echo "[watch] r2c battery done $(date)" >> "$LOG"
    bash benchmarks/battery_r3.sh >> "$LOG" 2>&1
    echo "[watch] r3 battery done $(date)" >> "$LOG"
    exit 0
  fi
  echo "[watch] down $(date)" >> "$LOG"
  sleep 180
done
