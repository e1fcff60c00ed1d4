#!/bin/bash
# Round-6 TPU job 3: ResNet-101 mm1x1 A/B (completes the bottleneck set)
# then the final bench.py headline on the warm cache.
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job3 start $(date -u +%FT%T) ===" | tee $L/job3.status
timeout 5400 python - > $L/mm1x1_r101.jsonl 2> $L/mm1x1_r101.err <<'PY'
import sys
sys.path.insert(0, "/root/repo")
from dlq_tpu.platform import apply_platform_env
apply_platform_env()
sys.path.insert(0, "/root/repo/tools")
import bench_round6
bench_round6.phase_mm1x1(depths=(101,))
PY
echo "mm1x1 r101 exit=$? $(date -u +%FT%T)" | tee -a $L/job3.status
timeout 3600 python bench.py > $L/bench_headline.json 2> $L/bench_headline.err
echo "bench exit=$? $(date -u +%FT%T)" | tee -a $L/job3.status
echo "=== r6 job3 done $(date -u +%FT%T) ===" | tee -a $L/job3.status
