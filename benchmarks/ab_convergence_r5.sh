#!/bin/bash
# Round-5 convergence-length re-gate (VERDICT r4 #3): >=5k-iter A/B of the
# FULL promoted TPU-overlay stack (configs/.../occnerf_tpu.yaml: compaction
# 0.375 + proxy ranking + rank/eval/compute bf16 + 2^14 cap) against a
# conservative exact-f32 uncompacted control, on two synthetic subjects
# including the texture-freq-60 collision-stress one.  The control keeps
# the 2^14 cap: the 2^19-vs-2^14 delta has its own 300-iter gate (ROADMAP
# collision-stress table) and 2^19 at 5k iters costs ~15h/arm on this chip.
#
# Results append to docs/gates_r5.log as they complete (arms are long;
# partial results must survive an interrupted session).
set -u
cd "$(dirname "$0")/.."
LOG=docs/gates_r5.log
ITERS=${ITERS:-5000}

N=0
run() {
  N=$((N + 1))
  echo "=== $(date -u +%FT%TZ) $*" >> "$LOG"
  timeout 14400 python benchmarks/ab_compaction.py "$@" \
    > "/tmp/ab_r5_arm_$N.log" 2>&1
  grep -E "AB_RESULT|Traceback|Error" "/tmp/ab_r5_arm_$N.log" >> "$LOG"
}

# subject 1 (seed 1, default texture)
run --seed 1 --iters "$ITERS" --arms 0.375 --proxy \
    --rank-dtype bfloat16 --eval-dtype bfloat16 --compute-dtype bfloat16 \
    --eval-compaction 0.25
run --seed 1 --iters "$ITERS" --arms 1.0

# subject 2: texture-freq 60 (hash-collision stress)
run --seed 1 --iters "$ITERS" --texture-freq 60 --arms 0.375 --proxy \
    --rank-dtype bfloat16 --eval-dtype bfloat16 --compute-dtype bfloat16 \
    --eval-compaction 0.25
run --seed 1 --iters "$ITERS" --texture-freq 60 --arms 1.0

echo "=== $(date -u +%FT%TZ) ab_convergence_r5 done" >> "$LOG"
