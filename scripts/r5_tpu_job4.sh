#!/bin/bash
# Round-5 TPU job 4: re-run the W4 tile/impl autotune with the tn=512
# k-cached candidates (the r3-measured config) and refresh the shipped table.
cd /root/repo
L=runlogs/r5
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job4 start $(date -u +%FT%T) ===" | tee $L/job4.status
timeout 7200 python tools/bench_round5.py tiles --write-table \
    > $L/tiles2.jsonl 2> $L/tiles2.err
echo "tiles2 exit=$? $(date -u +%FT%T)" | tee -a $L/job4.status
echo "=== r5 job4 done $(date -u +%FT%T) ===" | tee -a $L/job4.status
