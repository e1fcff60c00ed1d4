#!/bin/bash
# Round-5 TPU job 2: trained DeiT at scale through the EXTENDED variant
# table — W8A8 (sitewise/per-layer/stacked), split-attention int8, and the
# int4 method gradient deployed via the W4A8 fused block kernels
# (rtn/gptq/gptq+bc) + ptq_auto sitewise AND LN-folded block deploy.
cd /root/repo
L=runlogs/r5
mkdir -p $L
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job2 start $(date -u +%FT%T) ===" | tee $L/job2.status
timeout 10800 python tools/trained_accuracy_study.py --model none --deit \
    --data synthetic_hard_vit --n 20000 --epochs 20 --runlog runlogs/r5 \
    > $L/trained_deit_int4_scale.jsonl 2> $L/trained_deit_int4_scale.err
echo "deit int4 scale exit=$? $(date -u +%FT%T)" | tee -a $L/job2.status
echo "=== r5 job2 done $(date -u +%FT%T) ===" | tee -a $L/job2.status
