#!/bin/bash
# Round-3 TPU job 1: record the three missing round-2 verdicts (serialized, one TPU process at a time)
cd /root/repo
L=runlogs/r3
echo "=== job1 start $(date -u +%FT%T) ===" | tee $L/job1.status
timeout 3600 python tools/bench_round2b.py a2 c2 > $L/bench_round2b.jsonl 2> $L/bench_round2b.err
echo "bench_round2b exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
timeout 1800 python tools/repro_int8_backend_bugs.py > $L/repro_int8_bugs.txt 2>&1
echo "repro_int8_backend_bugs exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
timeout 1800 python tools/retry_int8_attention.py > $L/retry_int8_attention.txt 2>&1
echo "retry_int8_attention exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status
echo "=== job1 done $(date -u +%FT%T) ===" | tee -a $L/job1.status
