#!/bin/bash
# Round-4 TPU job 4: consolidated misc sweep (ViT block bt retry incl. the
# previously-failing bt16/bt32 compiles, ResNet-50/34 batch, MNv2 1.4x,
# profiler trace smoke). Run LAST: a Mosaic SIGABRT on a bt variant would
# kill the process (per-variant try/except catches Python errors only).
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job4 start $(date -u +%FT%T) ===" | tee $L/job4.status
timeout 7200 python tools/bench_misc_sweep.py > $L/misc_sweep.jsonl 2> $L/misc_sweep.err
echo "bench_misc_sweep exit=$? $(date -u +%FT%T)" | tee -a $L/job4.status
echo "=== job4 done $(date -u +%FT%T) ===" | tee -a $L/job4.status
