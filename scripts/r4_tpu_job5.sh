#!/bin/bash
# Round-4 TPU job 5: margin-calibrated 50k surrogate (Bayes ~96.6%) so the
# CIFAR-scale PTQ deltas are informative (the plain surrogate saturated).
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job5 start $(date -u +%FT%T) ===" | tee $L/job5.status
timeout 9000 python tools/trained_accuracy_study.py --data synthetic_hard \
    --n 50000 --epochs 20 --runlog runlogs/r4 \
    > $L/trained_synthetic_hard50k.jsonl 2> $L/trained_synthetic_hard50k.err
echo "trained synthetic_hard50k exit=$? $(date -u +%FT%T)" | tee -a $L/job5.status
echo "=== job5 done $(date -u +%FT%T) ===" | tee -a $L/job5.status
