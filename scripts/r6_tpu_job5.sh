#!/bin/bash
# Round-6 TPU job 5: complete the W4 throughput matrix — W8A8 vs W4A8
# FullFused pairs for ResNet-50/101/152 b128 (cosine-gated), under the
# adopted mm1x1 default.
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job5 start $(date -u +%FT%T) ===" | tee $L/job5.status
timeout 7200 python tools/bench_w4a8_models.py deep \
    > $L/w4a8_deep.jsonl 2> $L/w4a8_deep.err
echo "w4a8 deep exit=$? $(date -u +%FT%T)" | tee -a $L/job5.status
echo "=== r6 job5 done $(date -u +%FT%T) ===" | tee -a $L/job5.status
