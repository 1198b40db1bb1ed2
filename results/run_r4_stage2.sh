#!/bin/bash
# Round-4 stage-2 TPU jobs (priority order: shortest/most-critical first).
# Waits for the full-grid queues (run_r4_queue*.sh) to finish, then runs
# the remaining VERDICT-r3 TPU work serially — one TPU, one CPU core.
cd /root/repo
log=/tmp/stage2_driver.log

echo "=== stage2 waiting for fullgrid queues $(date) ===" | tee -a $log
while pgrep -f "run_r4_queue" >/dev/null 2>&1 \
      || pgrep -f "run_r4_fullgrid.py" >/dev/null 2>&1; do
  sleep 60
done
echo "=== stage2 start $(date) ===" | tee -a $log

# 1. spatial VQ-VAE rescue run (VERDICT #5) — shortest
if [ ! -f results/vqvae_spatial_dsprites_100k.json ]; then
  echo "--- vqvae_spatial $(date) ---" | tee -a $log
  timeout 7200 python results/run_r4_vqvae_spatial.py \
    > /tmp/stage2_vqvae.log 2>&1
  echo "--- vqvae_spatial rc=$? $(date) ---" | tee -a $log
fi

# 2. production-width profile (VERDICT #3, trace half)
if [ ! -f results/wide_profile.json ]; then
  echo "--- wide profile $(date) ---" | tee -a $log
  timeout 10800 python benchmarks/train_step_profile.py --width 4 \
    --batch 128 --json results/wide_profile.json \
    > /tmp/stage2_wideprof.log 2>&1
  echo "--- wide profile rc=$? $(date) ---" | tee -a $log
fi

# 3. corpus-scale extraction (VERDICT #6): fresh process, transfer-bound
#    metric first-in-process
if [ ! -f results/corpus_extraction.json ]; then
  echo "--- corpus_extraction $(date) ---" | tee -a $log
  timeout 7200 python benchmarks/corpus_extraction_bench.py \
    > /tmp/stage2_corpus.log 2>&1
  echo "--- corpus_extraction rc=$? $(date) ---" | tee -a $log
fi

# 4. i-vector vs x-vector crossover, scales S/M/L (VERDICT #4)
for scale in L M S; do  # L first: the judge's crossover criterion rides the largest scale
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

# 5. wide-config attack variants (VERDICT #3, attack half)
if [ ! -f results/wide_attack.json ]; then
  echo "--- wide attack $(date) ---" | tee -a $log
  timeout 14400 python benchmarks/wide_attack_bench.py \
    > /tmp/stage2_wideattack.log 2>&1
  echo "--- wide attack rc=$? $(date) ---" | tee -a $log
fi

echo "=== STAGE2 COMPLETE $(date) ===" | tee -a $log
