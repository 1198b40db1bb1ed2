#!/bin/bash
# Round-4 full-grid benchmark queue: runs each model with auto-retry/resume.
# Each model run resumes from its in-loop checkpoint (250k-step granularity)
# so a tunnel stall or crash costs at most a few minutes of TPU time.
cd /root/repo
for model in betavae4 betavae8 factorvae adagvae; do
  json="results/fullgrid/${model}_fullgrid.json"
  if [ -f "$json" ]; then
    echo "=== $model already done ($(date)) ==="
    continue
  fi
  for attempt in 1 2 3 4 5; do
    echo "=== $model attempt $attempt $(date) ===" | tee -a /tmp/fullgrid_driver.log
    timeout 10800 python results/run_r4_fullgrid.py "$model" \
      >> "/tmp/fullgrid_${model}.log" 2>&1
    rc=$?
    if [ -f "$json" ]; then
      echo "=== $model DONE rc=$rc $(date) ===" | tee -a /tmp/fullgrid_driver.log
      break
    fi
    echo "=== $model attempt $attempt failed rc=$rc $(date) ===" | tee -a /tmp/fullgrid_driver.log
    sleep 20
  done
done
echo "=== QUEUE COMPLETE $(date) ===" | tee -a /tmp/fullgrid_driver.log
