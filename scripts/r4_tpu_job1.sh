#!/bin/bash
# Round-4 TPU job 1: serving-layer bench + ResNet-50/101/152 sweep + libtpu retries.
# One TPU process at a time (relay constraint); jsonl evidence is git-tracked.
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job1 start $(date -u +%FT%T) ===" | tee $L/job1.status
timeout 9000 python tools/bench_round4.py info serving deep > $L/round4_stdout.jsonl 2> $L/round4.err
echo "bench_round4 exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
timeout 2400 python tools/repro_int8_backend_bugs.py > $L/repro_int8_bugs.txt 2>&1
echo "repro_int8_backend_bugs exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
timeout 2400 python tools/retry_int8_attention.py > $L/retry_int8_attention.txt 2>&1
echo "retry_int8_attention exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
echo "=== job1 done $(date -u +%FT%T) ===" | tee -a $L/job1.status
