#!/bin/bash
# Round-6 TPU job 6: deep-resnet W4A8 re-measure with mm1x1 now reaching
# int4-unpacked weights in the fused ctx (expect the ~+4-6% W8A8 win to
# transfer).
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job6 start $(date -u +%FT%T) ===" | tee $L/job6.status
timeout 7200 python tools/bench_w4a8_models.py deep \
    > $L/w4a8_deep_mm.jsonl 2> $L/w4a8_deep_mm.err
echo "w4a8 deep mm exit=$? $(date -u +%FT%T)" | tee -a $L/job6.status
echo "=== r6 job6 done $(date -u +%FT%T) ===" | tee -a $L/job6.status
