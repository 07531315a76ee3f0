#!/usr/bin/env bash
# Head-to-head baseline: train + evaluate the REFERENCE implementation
# (/root/reference, torch+scipy, CPU) on the repo's shared 4GI dataset under
# its own protocol (configs/4gi_baseline.yaml, 300 epochs, seed 0), so the
# repo's accuracy numbers can be compared against the reference *as it
# actually runs* rather than its manuscript claims.
#
# Runs three variants matching the manuscript ablation table
# (/root/reference/manuscript.tex:779-798):
#   hybrid      (--no-bayes, per configs/4gi_baseline.yaml no_bayes: true)
#   mech-only   (--no-nn --no-bayes)
#   no-physics  (--no-physics --no-bayes)
#
# Usage: bash benchmarks/ref_head2head.sh
# Results land in results/ref_head2head/ (checkpoints/, runs/, eval CSVs,
# timing.json). Expected total wall-clock: hours (scipy solve_ivp per window).
set -u
REPO=/root/repo
REF=/root/reference
WORK=$REPO/results/ref_head2head
DATA=$REPO/data/4gi_dataset.csv
CFG=$REF/configs/4gi_baseline.yaml
mkdir -p "$WORK"
cd "$WORK"
# arviz is not in this image; the reference imports it at module scope
# (inference/mcmc.py:11) even on --no-bayes paths. Shim it.
export PYTHONPATH="$WORK/_shims${PYTHONPATH:+:$PYTHONPATH}"

declare -a NAMES=(ref_hybrid ref_mech_only ref_no_physics)
declare -a FLAGS=("--no-bayes" "--no-nn --no-bayes" "--no-physics --no-bayes")

echo "{" > timing.json
for i in 0 1 2; do
  name=${NAMES[$i]}
  flags=${FLAGS[$i]}
  echo "=== $name ($flags) ==="
  t0=$(date +%s)
  python "$REF/train/train_hybrid.py" \
    --config "$CFG" --data "$DATA" --solver dopri5 \
    $flags --experiment-name "$name" --seed 0 \
    > "train_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "  train rc=$rc wall=$((t1-t0))s"
  python "$REF/eval/evaluate.py" "checkpoints/$name/best_model.pth" \
    --data "$DATA" --output "eval_${name}.csv" \
    > "eval_${name}.log" 2>&1
  erc=$?
  t2=$(date +%s)
  echo "  eval rc=$erc wall=$((t2-t1))s"
  comma=$([ $i -lt 2 ] && echo "," || echo "")
  echo "  \"$name\": {\"train_s\": $((t1-t0)), \"eval_s\": $((t2-t1)), \"train_rc\": $rc, \"eval_rc\": $erc}$comma" >> timing.json
done
echo "}" >> timing.json
echo DONE
