#!/bin/bash
# Round-5 TPU job 6: full-K tile candidates at the remaining W8A8 shapes +
# clean-methodology roofline A/B (old default vs new winner) at 4096^3;
# refresh the shipped table.
cd /root/repo
L=runlogs/r5
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job6 start $(date -u +%FT%T) ===" | tee $L/job6.status
timeout 7200 python - > $L/tiles4.jsonl 2> $L/tiles4.err <<'PYEOF'
import json, sys
sys.path.insert(0, "/root/repo")
from dlq_tpu.platform import apply_platform_env
apply_platform_env()
from dlq_tpu.ops import tile_autotune as TA

# clean roofline A/B first (iters=20, the bench/roofline methodology)
from dlq_tpu.bench.roofline import int8_matmul_roofline
for name, kw in (("default_512_1024_512", {}),
                 ("fullk_512_512_4096", {"tm": 512, "tn": 512, "tk": 4096}),
                 ("halfk_512_1024_2048", {"tm": 512, "tn": 1024, "tk": 2048})):
    r = int8_matmul_roofline(iters=20, **kw)
    print(json.dumps({"phase": "roofline_ab", "variant": name,
                      **{k: round(v, 4) if isinstance(v, float) else v
                         for k, v in r.items()}}), flush=True)

# extend the per-shape sweeps with full-K / large-tk candidates
shapes = [(256, 4096, 4096), (1024, 4096, 4096), (25088, 512, 512)]
cands = [(512, 1024, 512), (512, 512, 4096), (512, 1024, 2048),
         (256, 512, 4096), (256, 1024, 2048), (512, 512, 512)]
for M, K, N in shapes:
    e = TA.autotune_int8(M, K, N, candidates=cands, iters=10)
    print(json.dumps({"phase": "tiles4", "kind": "w8a8", "M": M, "K": K,
                      "N": N, **e}), flush=True)

# merge the measured cache into the shipped table
local = TA._load(TA.cache_path())
table = TA._load(TA.TABLE_PATH)
table.update(local)
with open(TA.TABLE_PATH, "w") as f:
    json.dump(table, f, indent=1, sort_keys=True)
print(json.dumps({"phase": "tiles4", "wrote_table": TA.TABLE_PATH,
                  "entries": len(table)}), flush=True)
PYEOF
echo "tiles4 exit=$? $(date -u +%FT%T)" | tee -a $L/job6.status
echo "=== r5 job6 done $(date -u +%FT%T) ===" | tee -a $L/job6.status
