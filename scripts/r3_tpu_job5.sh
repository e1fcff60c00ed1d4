#!/bin/bash
# Round-3 TPU job 5: 500-image step9-scale e2e + headline bench + compile-cache probe
cd /root/repo
L=runlogs/r3
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job5 start $(date -u +%FT%T) ===" > $L/job5.status
timeout 4000 python tools/bench_real_images.py > $L/bench_real_images.jsonl 2> $L/bench_real_images.err
echo "bench_real_images exit=$? $(date -u +%FT%T)" >> $L/job5.status
timeout 4000 python bench.py > $L/bench_headline_1.json 2> $L/bench_headline_1.err
echo "bench run1 exit=$? $(date -u +%FT%T)" >> $L/job5.status
timeout 4000 python bench.py > $L/bench_headline_2.json 2> $L/bench_headline_2.err
echo "bench run2 (cache-warm probe) exit=$? $(date -u +%FT%T)" >> $L/job5.status
ls $HOME/.cache/dlq_xla 2>/dev/null | wc -l > $L/compile_cache_entries.txt
echo "=== job5 done $(date -u +%FT%T) ===" >> $L/job5.status
