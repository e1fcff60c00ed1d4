#!/bin/bash
# Round-6 TPU job 1: MobileNetV2 trained-accuracy study at flagship scale
# (VERDICT r4 #1 — the last empty model-family cell; BASELINE config 4's
# depthwise-conv PTQ question). Margin-calibrated 50k surrogate, fp32>=0.85
# hard gate, full PTQ method gradient + QAT rescue at int4/int2.
cd /root/repo
L=runlogs/r6
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job1 start $(date -u +%FT%T) ===" | tee $L/job1.status
timeout 600 python tools/bench_round6.py info \
    >> $L/round6.jsonl 2> $L/info.err
echo "info exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
timeout 12600 python tools/trained_accuracy_study.py --model mobilenetv2 \
    --data synthetic_hard --n 50000 --epochs 24 --qat --runlog runlogs/r6 \
    > $L/trained_mnv2_50k.jsonl 2> $L/trained_mnv2_50k.err
echo "mnv2 50k study exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
echo "=== r6 job1 done $(date -u +%FT%T) ===" | tee -a $L/job1.status
