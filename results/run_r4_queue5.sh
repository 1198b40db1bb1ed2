#!/bin/bash
# Round-4 queue, part 5: final-stretch priority order sized to the
# remaining round clock.  Waits for the in-flight vqvae python
# (/tmp/vqvae.pid), then: wide profile (judge #3 trace half) ->
# betavae4 @ Locatello lr=1e-4 seed spread (the recipe-vs-harness
# discriminator for judge #1) -> corpus extraction (#6) ->
# crossover S, M (shortest-first so SOMETHING lands; L and wide_attack
# only if the clock allows) .  Done-file guarded.
cd /root/repo
log=/tmp/r4q5_driver.log
echo "=== queue5 start $(date) ===" | tee -a $log

if [ -f /tmp/vqvae.pid ]; then
  vpid=$(cat /tmp/vqvae.pid)
  while kill -0 "$vpid" 2>/dev/null; do sleep 30; done
  echo "=== vqvae process $vpid exited $(date) ===" | tee -a $log
fi

if [ ! -f results/wide_profile.json ]; then
  echo "--- wide profile $(date) ---" | tee -a $log
  timeout 10800 python benchmarks/train_step_profile.py --width 4 \
    --batch 128 --json results/wide_profile.json > /tmp/stage2_wideprof.log 2>&1
  echo "--- wide profile rc=$? $(date) ---" | tee -a $log
fi

if [ ! -f results/fullgrid/betavae4lr1e4_seed5_300k.json ]; then
  echo "--- lr1e4 seed spread $(date) ---" | tee -a $log
  timeout 7200 python results/fullgrid/run_seed_spread.py --lr 1e-4 \
    --tag lr1e4 > /tmp/stage2_lr1e4.log 2>&1
  echo "--- lr1e4 rc=$? $(date) ---" | tee -a $log
fi

if [ ! -f results/corpus_extraction.json ]; then
  echo "--- corpus_extraction $(date) ---" | tee -a $log
  timeout 7200 python benchmarks/corpus_extraction_bench.py > /tmp/stage2_corpus.log 2>&1
  echo "--- corpus_extraction rc=$? $(date) ---" | tee -a $log
fi

for scale in S M L; do
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

echo "=== QUEUE5 COMPLETE $(date) ===" | tee -a $log
