#!/bin/bash
# Probe the axon TPU every 5 min; when it answers, run the measurement
# battery once and exit. Log: /tmp/tpu_watch.log
cd /root/repo
while true; do
  if timeout 240 python -c "import jax; print(jax.devices())" \
      >>/tmp/tpu_watch.log 2>&1; then
    echo "TPU up at $(date)" >> /tmp/tpu_watch.log
    bash turborc_tpu/bench/tpu_battery.sh >>/tmp/tpu_watch.log 2>&1
    echo "battery finished at $(date)" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "TPU down at $(date)" >> /tmp/tpu_watch.log
  sleep 300
done
