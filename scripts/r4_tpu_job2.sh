#!/bin/bash
# Round-4 TPU job 2: trained-accuracy ladder growth — QAT int4/int2 on the
# real-digits flagship, then the CIFAR-scale synthetic surrogate (50k imgs).
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job2 start $(date -u +%FT%T) ===" | tee $L/job2.status
timeout 9000 python tools/trained_accuracy_study.py --data digits --epochs 30 \
    --deit --qat --runlog runlogs/r4 > $L/trained_digits_qat.jsonl 2> $L/trained_digits_qat.err
echo "trained digits+qat exit=$? $(date -u +%FT%T)" | tee -a $L/job2.status
timeout 9000 python tools/trained_accuracy_study.py --data synthetic --n 50000 \
    --epochs 20 --runlog runlogs/r4 > $L/trained_synthetic50k.jsonl 2> $L/trained_synthetic50k.err
echo "trained synthetic50k exit=$? $(date -u +%FT%T)" | tee -a $L/job2.status
echo "=== job2 done $(date -u +%FT%T) ===" | tee -a $L/job2.status
