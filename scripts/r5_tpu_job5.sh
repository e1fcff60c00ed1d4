#!/bin/bash
# Round-5 TPU job 5: deeper W8A8 candidate sweep at the 4096^3 roofline
# anchor (the r1 hand-sweep covered a few; the autotune records 9 total).
cd /root/repo
L=runlogs/r5
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job5 start $(date -u +%FT%T) ===" | tee $L/job5.status
timeout 5400 python - > $L/tiles3.jsonl 2> $L/tiles3.err <<'PYEOF'
import json, sys, os
sys.path.insert(0, "/root/repo")
from dlq_tpu.platform import apply_platform_env
apply_platform_env()
from dlq_tpu.ops import tile_autotune as TA
cands = [(512, 1024, 512), (512, 2048, 512), (1024, 1024, 512),
         (512, 1024, 1024), (2048, 512, 512), (512, 1024, 2048),
         (256, 2048, 512), (1024, 2048, 512), (512, 512, 4096)]
e = TA.autotune_int8(4096, 4096, 4096, candidates=cands, iters=10)
print(json.dumps({"phase": "tiles3", "kind": "w8a8", "M": 4096, "K": 4096,
                  "N": 4096, **e}), flush=True)
PYEOF
echo "tiles3 exit=$? $(date -u +%FT%T)" | tee -a $L/job5.status
echo "=== r5 job5 done $(date -u +%FT%T) ===" | tee -a $L/job5.status
