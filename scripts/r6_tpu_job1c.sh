#!/bin/bash
# Round-6 TPU job 1c: MNv2 study dataset fallback. The synthetic_hard
# surrogate is a GLOBAL-template matched-filter task (full-image prototypes
# at alpha 0.08); MNv2's depthwise-separable 3x3 + 1x1 stack cannot build
# global templates the way resnet's residual 3x3 stack can, and it lands at
# 0.32-0.43 regardless of regularization (job1b). Fall back to surrogates
# with LOCAL class structure: patch-8-constant prototypes
# (synthetic_hard_vit, Bayes ~98.5%) and the real scanned digits.
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job1c start $(date -u +%FT%T) ===" | tee $L/job1c.status
run_attempt () {
  local tag=$1; shift
  timeout 12600 python tools/trained_accuracy_study.py --model mobilenetv2 \
      --qat --runlog runlogs/r6 "$@" \
      > $L/trained_mnv2_$tag.jsonl 2> $L/trained_mnv2_$tag.err
  local rc=$?
  echo "attempt $tag ($*) exit=$rc $(date -u +%FT%T)" | tee -a $L/job1c.status
  return $rc
}
run_attempt vit50k --data synthetic_hard_vit --n 50000 --epochs 15 --wd 1e-4 || \
run_attempt digits --data digits --epochs 25 --lr 0.02 --wd 1e-4
echo "=== r6 job1c done $(date -u +%FT%T) ===" | tee -a $L/job1c.status
