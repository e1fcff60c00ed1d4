#!/bin/bash
# Round-3 TPU job 4: the trained-accuracy study (VERDICT r2 #1) — resnet18s
# on real digits to >=90% + trained DeiT, full PTQ table, hard acc gate.
cd /root/repo
L=runlogs/r3
echo "=== job4 start $(date -u +%FT%T) ===" > $L/job4.status
timeout 10000 python tools/trained_accuracy_study.py --data digits --epochs 30 \
  --deit --runlog runlogs > $L/trained_study.jsonl 2> $L/trained_study.err
echo "trained_accuracy_study exit=$? $(date -u +%FT%T)" >> $L/job4.status
echo "=== job4 done $(date -u +%FT%T) ===" >> $L/job4.status
