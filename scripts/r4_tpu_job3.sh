#!/bin/bash
# Round-4 TPU job 3: 500-JPEG step9-scale e2e + headline bench (x2 = compile-cache probe).
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job3 start $(date -u +%FT%T) ===" | tee $L/job3.status
timeout 4800 python tools/bench_real_images.py --runlog runlogs/r4 > $L/bench_real_images.jsonl 2> $L/bench_real_images.err
echo "bench_real_images exit=$? $(date -u +%FT%T)" | tee -a $L/job3.status
timeout 4800 python bench.py > $L/bench_headline_1.json 2> $L/bench_headline_1.err
echo "bench run1 exit=$? $(date -u +%FT%T)" | tee -a $L/job3.status
timeout 2400 python bench.py > $L/bench_headline_2.json 2> $L/bench_headline_2.err
echo "bench run2 (cache-warm probe) exit=$? $(date -u +%FT%T)" | tee -a $L/job3.status
ls $HOME/.cache/dlq_xla 2>/dev/null | wc -l > $L/compile_cache_entries.txt
echo "=== job3 done $(date -u +%FT%T) ===" | tee -a $L/job3.status
