#!/bin/bash
# Round-5 TPU job 1: int8-attention A/B -> tile autotune -> headline bench.
# Phases run as SEPARATE python processes (sequential, never concurrent)
# so a Mosaic SIGABRT in one new kernel cannot take down the rest.
cd /root/repo
L=runlogs/r5
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job1 start $(date -u +%FT%T) ===" | tee $L/job1.status

timeout 9000 python tools/bench_round5.py info attn \
    > $L/attn_ab.jsonl 2> $L/attn_ab.err
echo "attn exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status

timeout 9000 python tools/bench_round5.py tiles --write-table \
    > $L/tiles.jsonl 2> $L/tiles.err
echo "tiles exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status

timeout 4000 python bench.py > $L/bench_headline.json 2> $L/bench_headline.err
echo "bench exit=$? $(date -u +%FT%T)" | tee -a $L/job1.status

echo "=== r5 job1 done $(date -u +%FT%T) ===" | tee -a $L/job1.status
