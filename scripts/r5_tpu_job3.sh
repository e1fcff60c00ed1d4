#!/bin/bash
# Round-5 TPU job 3: PTQ-vs-QAT on the trained DeiT at int4/int2 — the
# reference's roadmapped INT8/INT2 training experiment answered for the
# transformer family (the conv flagship's answer landed in round 4).
cd /root/repo
L=runlogs/r5
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job3 start $(date -u +%FT%T) ===" | tee $L/job3.status
timeout 10800 python tools/trained_accuracy_study.py --model none --deit \
    --data synthetic_hard_vit --n 20000 --epochs 20 --qat --qat-epochs 6 \
    --runlog runlogs/r5 \
    > $L/trained_deit_qat.jsonl 2> $L/trained_deit_qat.err
echo "deit qat exit=$? $(date -u +%FT%T)" | tee -a $L/job3.status
echo "=== r5 job3 done $(date -u +%FT%T) ===" | tee -a $L/job3.status
