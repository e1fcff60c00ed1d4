#!/bin/bash
# Round-6 TPU job 4: MNv2 DeployCtx mm1x1 A/B (decides the DeployCtx
# default) + the BONUS MNv2 1.4x trained study (BASELINE config 4 names
# both widths).
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job4 start $(date -u +%FT%T) ===" | tee $L/job4.status
timeout 5400 python tools/bench_round6.py mnv2_mm1x1 \
    > $L/mnv2_mm1x1.jsonl 2> $L/mnv2_mm1x1.err
echo "mnv2_mm1x1 exit=$? $(date -u +%FT%T)" | tee -a $L/job4.status
timeout 12600 python tools/trained_accuracy_study.py --model mobilenetv2 \
    --width-mult 1.4 --data synthetic_hard_vit --n 50000 --epochs 15 \
    --wd 1e-4 --qat --runlog runlogs/r6 \
    > $L/trained_mnv2_14x.jsonl 2> $L/trained_mnv2_14x.err
echo "mnv2 1.4x study exit=$? $(date -u +%FT%T)" | tee -a $L/job4.status
echo "=== r6 job4 done $(date -u +%FT%T) ===" | tee -a $L/job4.status
