#!/bin/bash
cd /root/repo
L=runlogs/r3
echo "=== job3 start $(date -u +%FT%T) ===" > $L/job3.status
timeout 3600 python tools/bench_round3.py a3 b3 c3 > $L/bench_round3.jsonl 2> $L/bench_round3.err
echo "bench_round3 exit=$? $(date -u +%FT%T)" >> $L/job3.status
echo "=== job3 done $(date -u +%FT%T) ===" >> $L/job3.status
