#!/bin/bash
# Round-4 TPU job 6: uint8-ingest fused stem A/B at the headline batch.
cd /root/repo
L=runlogs/r4
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== job6 start $(date -u +%FT%T) ===" | tee $L/job6.status
timeout 4800 python tools/bench_round4.py u8 > $L/u8_ingest.jsonl 2> $L/u8_ingest.err
echo "u8 exit=$? $(date -u +%FT%T)" | tee -a $L/job6.status
echo "=== job6 done $(date -u +%FT%T) ===" | tee -a $L/job6.status
