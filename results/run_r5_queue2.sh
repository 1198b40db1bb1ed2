#!/bin/bash
# Round-5 queue, part 2 (VERDICT r4 tasks 3-5).  Chained by run_r5_queue.sh
# after the wide attack + Shapes3D grids; safe to run standalone (each job
# is done-file guarded).
cd /root/repo
log=/tmp/r5q_driver.log
echo "=== r5 queue2 start $(date) ===" | tee -a $log

# adagvae shapes3d retry: queue1's attempts ran before the flat-grid OOM
# fix (u8[480k,64,64,3] gather-layout copy padded 2x -> 16.5G > HBM)
if [ ! -f results/fullgrid/adagvae_shapes3d_fullgrid.json ]; then
  for attempt in 1 2; do
    echo "=== shapes3d adagvae (fixed) attempt $attempt $(date) ===" \
      | tee -a $log
    timeout 14400 python results/run_r4_shapes3d.py adagvae \
      >> /tmp/r5_shapes3d_adagvae.log 2>&1
    [ -f results/fullgrid/adagvae_shapes3d_fullgrid.json ] && break
  done
fi

# task 5: sustained-extraction decomposition (instrumented write path);
# two draws for the transfer-variance pairing rule
if [ ! -f results/corpus_extraction.json ] || \
   ! grep -q phase_sec results/corpus_extraction.json; then
  echo "--- corpus_extraction draw A $(date) ---" | tee -a $log
  timeout 7200 python benchmarks/corpus_extraction_bench.py \
    > /tmp/r5_corpus_a.log 2>&1
  echo "--- corpus_extraction A rc=$? $(date) ---" | tee -a $log
  cp results/corpus_extraction.json results/corpus_extraction_r5a.json \
    2>/dev/null
  echo "--- corpus_extraction draw B $(date) ---" | tee -a $log
  timeout 7200 python benchmarks/corpus_extraction_bench.py \
    > /tmp/r5_corpus_b.log 2>&1
  echo "--- corpus_extraction B rc=$? $(date) ---" | tee -a $log
fi

# task 3: the architecture discrimination run — dlib's exact ReLU trunk,
# Locatello's exact constant-1e-4 Adam, same seeds as the elu rows
if [ ! -f results/fullgrid/betavae4dlibtrunk_seed5_300k.json ]; then
  echo "--- dlib-trunk seed study $(date) ---" | tee -a $log
  timeout 14400 python results/fullgrid/run_seed_spread.py \
    --trunk dlib --lr 1e-4 --tag dlibtrunk --seeds 2 3 4 5 \
    > /tmp/r5_dlibtrunk.log 2>&1
  echo "--- dlib-trunk rc=$? $(date) ---" | tee -a $log
fi

# task 4: open-set (disjoint-speaker) verification crossover, M then L
for scale in M L; do
  if python - "$scale" <<'EOF'
import json, os, sys
p = "results/xvec/crossover_openset.json"
rows = json.load(open(p)) if os.path.exists(p) else []
sys.exit(1 if any(r["scale"] == sys.argv[1] for r in rows) else 0)
EOF
  then
    echo "--- crossover_openset $scale $(date) ---" | tee -a $log
    timeout 10800 python examples/tidigits/crossover_openset.py \
      --scale $scale > /tmp/r5_openset_$scale.log 2>&1
    echo "--- crossover_openset $scale rc=$? $(date) ---" | tee -a $log
  fi
done

# task 7 support: re-score the r4 dSprites rows under the r5 dlib
# estimator (held-out eval votes) so both datasets' leaderboards carry
# the same protocol
echo "--- dlib re-eval $(date) ---" | tee -a $log
timeout 10800 python results/fullgrid/reeval_dlib_r5.py \
  > /tmp/r5_reeval.log 2>&1
echo "--- dlib re-eval rc=$? $(date) ---" | tee -a $log

if [ -x results/run_r5_queue3.sh ]; then
  echo "=== chaining queue3 $(date) ===" | tee -a $log
  bash results/run_r5_queue3.sh
fi

echo "=== R5 QUEUE2 COMPLETE $(date) ===" | tee -a $log
