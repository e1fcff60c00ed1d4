#!/bin/bash
# Round-3 TPU job 2: MNv2 depthwise A/B + fused2 unpark + repro-fixed + stage roofline
cd /root/repo
L=runlogs/r3
echo "=== job2 start $(date -u +%FT%T) ===" > $L/job2.status
timeout 3600 python tools/bench_round2b.py c2 d2 > $L/bench_round2b_c2d2.jsonl 2> $L/bench_round2b_c2d2.err
echo "bench_round2b c2 d2 exit=$? $(date -u +%FT%T)" >> $L/job2.status
timeout 1800 python tools/repro_int8_backend_bugs.py > $L/repro_int8_bugs2.txt 2>&1
echo "repro_int8_backend_bugs exit=$? $(date -u +%FT%T)" >> $L/job2.status
timeout 3600 python tools/stage_roofline.py > $L/stage_roofline.jsonl 2> $L/stage_roofline.err
echo "stage_roofline exit=$? $(date -u +%FT%T)" >> $L/job2.status
echo "=== job2 done $(date -u +%FT%T) ===" >> $L/job2.status
