#!/bin/bash
# Round-6 TPU job 7: third-round cross-round reproducibility — the exact
# r4/r5 conv-flagship 50k invocation; r5 reproduced every PTQ delta and
# the fp32 accuracy bit-for-bit. NOTE: the study tool was refactored this
# round (shared train_and_gate + conv_ptq_table); identical numbers also
# prove the refactor changed nothing numerically.
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job7 start $(date -u +%FT%T) ===" | tee $L/job7.status
timeout 10800 python tools/trained_accuracy_study.py --data synthetic_hard \
    --n 50000 --epochs 20 --runlog runlogs/r6 \
    > $L/trained_synthetic_hard50k_repro2.jsonl 2> $L/trained_synthetic_hard50k_repro2.err
echo "repro2 exit=$? $(date -u +%FT%T)" | tee -a $L/job7.status
echo "=== r6 job7 done $(date -u +%FT%T) ===" | tee -a $L/job7.status
