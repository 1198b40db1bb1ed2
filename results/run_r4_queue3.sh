#!/bin/bash
# Round-4 queue, part 3 (fresh-VM restart of queue2 + stage2).
# Serial: one TPU, one CPU core.  Done-file guarded so it is safe to re-run.
# Priority: the judge's named full-grid recipes first (FactorVAE tc=35,
# Ada-GVAE), then betavae8 (budget-class 1.04M steps), then the short
# stage-2 jobs, then the long tail (crossover L, wide attack).
cd /root/repo
log=/tmp/r4q3_driver.log
echo "=== queue3 start $(date) ===" | tee -a $log

run_grid() {
  model=$1; shift
  json="results/fullgrid/${model}_fullgrid.json"
  if [ -f "$json" ]; then
    echo "=== $model already done ($(date)) ===" | tee -a $log
    return
  fi
  for attempt in 1 2 3; do
    echo "=== $model attempt $attempt $(date) ===" | tee -a $log
    timeout 12600 python results/run_r4_fullgrid.py "$model" "$@" \
      >> "/tmp/fullgrid_${model}.log" 2>&1
    rc=$?
    if [ -f "$json" ]; then
      echo "=== $model DONE rc=$rc $(date) ===" | tee -a $log
      return
    fi
    echo "=== $model attempt $attempt failed rc=$rc $(date) ===" | tee -a $log
    sleep 20
  done
}

run_grid factorvae
run_grid adagvae
run_grid betavae8 --steps 1036800

# stage-2 short jobs
if [ ! -f results/vqvae_spatial_dsprites_100k.json ]; then
  echo "--- vqvae_spatial $(date) ---" | tee -a $log
  timeout 7200 python results/run_r4_vqvae_spatial.py > /tmp/stage2_vqvae.log 2>&1
  echo "--- vqvae_spatial rc=$? $(date) ---" | tee -a $log
fi

if [ ! -f results/wide_profile.json ]; then
  echo "--- wide profile $(date) ---" | tee -a $log
  timeout 10800 python benchmarks/train_step_profile.py --width 4 \
    --batch 128 --json results/wide_profile.json > /tmp/stage2_wideprof.log 2>&1
  echo "--- wide profile rc=$? $(date) ---" | tee -a $log
fi

if [ ! -f results/corpus_extraction.json ]; then
  echo "--- corpus_extraction $(date) ---" | tee -a $log
  timeout 7200 python benchmarks/corpus_extraction_bench.py > /tmp/stage2_corpus.log 2>&1
  echo "--- corpus_extraction rc=$? $(date) ---" | tee -a $log
fi

# long tail
for scale in L M S; do
  if python - "$scale" <<'EOF'
import json, sys, os
p = "results/xvec/crossover.json"
rows = json.load(open(p)) if os.path.exists(p) else []
sys.exit(0 if not any(r["scale"] == sys.argv[1] for r in rows) else 1)
EOF
  then
    echo "--- crossover $scale $(date) ---" | tee -a $log
    timeout 10800 python examples/tidigits/crossover_study.py --scale $scale \
      > /tmp/stage2_crossover_$scale.log 2>&1
    echo "--- crossover $scale rc=$? $(date) ---" | tee -a $log
  fi
done

if [ ! -f results/wide_attack.json ]; then
  echo "--- wide attack $(date) ---" | tee -a $log
  timeout 14400 python benchmarks/wide_attack_bench.py > /tmp/stage2_wideattack.log 2>&1
  echo "--- wide attack rc=$? $(date) ---" | tee -a $log
fi

echo "=== QUEUE3 COMPLETE $(date) ===" | tee -a $log
