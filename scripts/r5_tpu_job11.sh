#!/bin/bash
# Round-5 TPU job 11: cross-round reproducibility check — re-run the conv
# flagship hard-surrogate study (round-4 rows: int8 <=0.08%, GPTQ+bc int4
# 0.13% vs RTN 0.47%) and compare deltas at 0.01% granularity.
cd /root/repo
L=runlogs/r5
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job11 start $(date -u +%FT%T) ===" | tee $L/job11.status
timeout 10800 python tools/trained_accuracy_study.py --data synthetic_hard \
    --n 50000 --epochs 20 --runlog runlogs/r5 \
    > $L/trained_synthetic_hard50k_repro.jsonl 2> $L/trained_synthetic_hard50k_repro.err
echo "repro exit=$? $(date -u +%FT%T)" | tee -a $L/job11.status
echo "=== r5 job11 done $(date -u +%FT%T) ===" | tee -a $L/job11.status
