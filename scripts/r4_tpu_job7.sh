#!/bin/bash
# Round-4 TPU job 7: trained DeiT on the margin-calibrated surrogate at
# scale — the ViT-family counterpart of the resnet18s synthetic_hard row.
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job7 start $(date -u +%FT%T) ===" | tee $L/job7.status
timeout 7200 python tools/trained_accuracy_study.py --model none --deit \
    --data synthetic_hard --n 20000 --epochs 20 --runlog runlogs/r4 \
    > $L/trained_deit_hard.jsonl 2> $L/trained_deit_hard.err
echo "deit hard exit=$? $(date -u +%FT%T)" | tee -a $L/job7.status
echo "=== job7 done $(date -u +%FT%T) ===" | tee -a $L/job7.status
