#!/bin/bash
# Round-6 TPU job 1b: MNv2 study retry ladder. Attempt 1 (no reg) memorized
# the 50k surrogate (loss 0.0033, test 0.429 < 0.85 gate, exit 3). Chained
# attempts with increasing regularization; the first to pass the fp32 gate
# runs the full PTQ table + QAT in the same invocation. ~10 min per failed
# attempt (gate aborts before any PTQ work).
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job1b start $(date -u +%FT%T) ===" | tee $L/job1b.status
run_attempt () {
  local tag=$1; shift
  timeout 12600 python tools/trained_accuracy_study.py --model mobilenetv2 \
      --data synthetic_hard --qat --runlog runlogs/r6 "$@" \
      > $L/trained_mnv2_50k_$tag.jsonl 2> $L/trained_mnv2_50k_$tag.err
  local rc=$?
  echo "attempt $tag ($*) exit=$rc $(date -u +%FT%T)" | tee -a $L/job1b.status
  return $rc
}
run_attempt a --n 50000 --epochs 15 --wd 1e-4 || \
run_attempt b --n 50000 --epochs 12 --lr 0.03 --wd 3e-4 --augment || \
run_attempt c --n 50000 --epochs 8 --lr 0.02 --wd 1e-3 --augment
echo "=== r6 job1b done $(date -u +%FT%T) ===" | tee -a $L/job1b.status
