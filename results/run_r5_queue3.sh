#!/bin/bash
# Round-5 queue, part 3: close the wide-MFU question.  bf16 compute won
# round 1 of the attack (MFU 44.0 -> 51.9%); this part (a) traces the bf16
# step so the remaining 48% is attributed at the same standard as the r4
# fp32 trace, and (b) measures the second-round levers (batch 512
# arithmetic intensity, space-to-depth first conv) on top of bf16.
cd /root/repo
log=/tmp/r5q_driver.log
echo "=== r5 queue3 start $(date) ===" | tee -a $log

have_variant() {
  python - "$1" <<'EOF'
import json, os, sys
p = "results/wide_attack.json"
rows = json.load(open(p)) if os.path.exists(p) else []
sys.exit(0 if any(r["variant"] == sys.argv[1] for r in rows) else 1)
EOF
}

for v in bf16+batch512 s2d+bf16; do
  if have_variant "$v"; then
    echo "--- wide_attack $v already done ($(date)) ---" | tee -a $log
    continue
  fi
  echo "--- wide_attack $v $(date) ---" | tee -a $log
  timeout 4500 python benchmarks/wide_attack_bench.py --variants "$v" \
    >> /tmp/r5_wideattack.log 2>&1
  echo "--- wide_attack $v rc=$? $(date) ---" | tee -a $log
done

if [ ! -f results/wide_profile_bf16.json ]; then
  echo "--- wide bf16 profile $(date) ---" | tee -a $log
  timeout 10800 python benchmarks/train_step_profile.py --width 4 \
    --batch 128 --compute-dtype bf16 \
    --json results/wide_profile_bf16.json > /tmp/r5_wideprof_bf16.log 2>&1
  echo "--- wide bf16 profile rc=$? $(date) ---" | tee -a $log
fi

# extraction attack: paired alternating fresh-process draws (tunnel
# transfer throughput swings 4x across a day — CLAUDE.md); draws A/B
# (queue2) were float32, so alternate f16/f32/f16 here
for tag in f16c f32d f16e; do
  [ -f "results/corpus_extraction_${tag}.json" ] && continue
  dt=""
  case $tag in f16*) dt="--transfer-dtype float16";; esac
  echo "--- corpus_extraction $tag $(date) ---" | tee -a $log
  timeout 7200 python benchmarks/corpus_extraction_bench.py $dt \
    --out-tag "$tag" > "/tmp/r5_corpus_$tag.log" 2>&1
  echo "--- corpus_extraction $tag rc=$? $(date) ---" | tee -a $log
done

# renderer-parameterization control (SPREAD.md last named suspect): elu
# trunk + constant-1e-4 Adam (the betavae4lr1e4 baseline config), lifted
# sprite-size floor; if scores stay in the elu band the renderer is
# exonerated and the architecture attribution stands alone
if [ ! -f results/fullgrid/betavae4bigsprite_seed3_300k.json ]; then
  echo "--- renderer control $(date) ---" | tee -a $log
  timeout 14400 python results/fullgrid/run_renderer_control.py \
    --seeds 2 3 > /tmp/r5_renderer.log 2>&1
  echo "--- renderer control rc=$? $(date) ---" | tee -a $log
fi

echo "=== R5 QUEUE3 COMPLETE $(date) ===" | tee -a $log
