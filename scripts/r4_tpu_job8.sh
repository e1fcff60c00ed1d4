#!/bin/bash
# Round-4 TPU job 8: trained DeiT on the patch-level margin-calibrated
# surrogate (alpha=0.10, patch-8 signal; Bayes ~98.5%).
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job8 start $(date -u +%FT%T) ===" | tee $L/job8.status
timeout 7200 python tools/trained_accuracy_study.py --model none --deit \
    --data synthetic_hard_vit --n 20000 --epochs 20 --runlog runlogs/r4 \
    > $L/trained_deit_hard_vit.jsonl 2> $L/trained_deit_hard_vit.err
echo "deit hard_vit exit=$? $(date -u +%FT%T)" | tee -a $L/job8.status
echo "=== job8 done $(date -u +%FT%T) ===" | tee -a $L/job8.status
