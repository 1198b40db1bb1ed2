#!/bin/bash
# Round-5 queue, part 1 (VERDICT r4 tasks 1+2).  Serial: one TPU, one CPU
# core.  Done-file guarded so it is safe to re-run.
# 1. wide-MFU attack (benchmarks/wide_attack_bench.py — scripted in r4,
#    never ran).  Each variant invoked separately so one failure cannot
#    take down the rest; the bench appends to results/wide_attack.json.
# 2. full-grid Shapes3D at the reference budget (172.8M train images),
#    betavae4 then adagvae then factorvae(tc=7).
cd /root/repo
log=/tmp/r5q_driver.log
echo "=== r5 queue start $(date) ===" | tee -a $log

have_variant() {
  python - "$1" <<'EOF'
import json, os, sys
p = "results/wide_attack.json"
rows = json.load(open(p)) if os.path.exists(p) else []
sys.exit(0 if any(r["variant"] == sys.argv[1] for r in rows) else 1)
EOF
}

for v in base batch256 bf16 remat d2s bf16+batch256 d2s+bf16+batch256; do
  if have_variant "$v"; then
    echo "--- wide_attack $v already done ($(date)) ---" | tee -a $log
    continue
  fi
  echo "--- wide_attack $v $(date) ---" | tee -a $log
  timeout 4500 python benchmarks/wide_attack_bench.py --variants "$v" \
    >> /tmp/r5_wideattack.log 2>&1
  echo "--- wide_attack $v rc=$? $(date) ---" | tee -a $log
done

run_grid() {
  model=$1; shift
  json="results/fullgrid/${model}_shapes3d_fullgrid.json"
  if [ -f "$json" ]; then
    echo "=== shapes3d $model already done ($(date)) ===" | tee -a $log
    return
  fi
  for attempt in 1 2 3; do
    echo "=== shapes3d $model attempt $attempt $(date) ===" | tee -a $log
    timeout 14400 python results/run_r4_shapes3d.py "$model" "$@" \
      >> "/tmp/r5_shapes3d_${model}.log" 2>&1
    rc=$?
    if [ -f "$json" ]; then
      echo "=== shapes3d $model DONE rc=$rc $(date) ===" | tee -a $log
      return
    fi
    echo "=== shapes3d $model attempt $attempt failed rc=$rc $(date) ===" \
      | tee -a $log
    sleep 20
  done
}

run_grid betavae4
run_grid adagvae
run_grid factorvae

# part 2 scripts are written while part 1 trains; chain if present
if [ -x results/run_r5_queue2.sh ]; then
  echo "=== chaining queue2 $(date) ===" | tee -a $log
  bash results/run_r5_queue2.sh
fi

echo "=== R5 QUEUE COMPLETE $(date) ===" | tee -a $log
