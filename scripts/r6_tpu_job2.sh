#!/bin/bash
# Round-6 TPU job 2: production-shape tile autotune (VERDICT r4 #4) +
# the 1x1-as-GEMM retries with autotuned tiles (kernel-level conv1x1 A/B,
# then model-level mm1x1 A/B on bottleneck resnets). Each phase its own
# process (a Mosaic SIGABRT must not kill the campaign).
cd /root/repo
L=runlogs/r6
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job2 start $(date -u +%FT%T) ===" | tee $L/job2.status
timeout 5400 python tools/bench_round6.py shapes --write-table \
    > $L/shapes.jsonl 2> $L/shapes.err
echo "shapes exit=$? $(date -u +%FT%T)" | tee -a $L/job2.status
timeout 3600 python tools/bench_round6.py conv1x1 \
    > $L/conv1x1.jsonl 2> $L/conv1x1.err
echo "conv1x1 exit=$? $(date -u +%FT%T)" | tee -a $L/job2.status
timeout 5400 python tools/bench_round6.py mm1x1 \
    > $L/mm1x1.jsonl 2> $L/mm1x1.err
echo "mm1x1 exit=$? $(date -u +%FT%T)" | tee -a $L/job2.status
echo "=== r6 job2 done $(date -u +%FT%T) ===" | tee -a $L/job2.status
