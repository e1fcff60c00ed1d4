#!/bin/bash
# Round-5 TPU job 9: tile-aware W4A16 autotune refresh (entries now carry
# the winning tiles) + W4A8 impl refresh with the new kernel defaults.
cd /root/repo
L=runlogs/r5
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job10 start $(date -u +%FT%T) ===" | tee $L/job10.status
timeout 7200 python - > $L/tiles7.jsonl 2> $L/tiles7.err <<'PYEOF'
import json, sys
sys.path.insert(0, "/root/repo")
from dlq_tpu.platform import apply_platform_env
apply_platform_env()
from dlq_tpu.ops import tile_autotune as TA
for M, K, N in [(256, 4096, 4096), (1024, 4096, 4096), (4096, 4096, 4096)]:
    e = TA.autotune_w4a16(M, K, N, iters=10)
    print(json.dumps({"phase": "tiles7", "kind": "w4a16", "M": M, "K": K,
                      "N": N, **e}), flush=True)
for M, K, N in [(1024, 4096, 4096), (4096, 4096, 4096)]:
    e = TA.autotune_w4a8(M, K, N, iters=10)
    print(json.dumps({"phase": "tiles7", "kind": "w4a8", "M": M, "K": K,
                      "N": N, **e}), flush=True)
local = TA._load(TA.cache_path())
table = TA._load(TA.TABLE_PATH)
table.update(local)
with open(TA.TABLE_PATH, "w") as f:
    json.dump(table, f, indent=1, sort_keys=True)
print(json.dumps({"phase": "tiles7", "wrote_table": TA.TABLE_PATH,
                  "entries": len(table)}), flush=True)
PYEOF
echo "tiles7 exit=$? $(date -u +%FT%T)" | tee -a $L/job10.status
