#!/bin/bash
# Round-5 TPU job 8: same-run Pallas-full-K vs XLA int8 dot at 4096^3.
cd /root/repo
L=runlogs/r5
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job8 start $(date -u +%FT%T) ===" | tee $L/job8.status
timeout 4000 python - > $L/pallas_vs_xla_int8.jsonl 2> $L/pallas_vs_xla_int8.err <<'PYEOF'
import json, sys
sys.path.insert(0, "/root/repo")
from dlq_tpu.platform import apply_platform_env
apply_platform_env()
from dlq_tpu.bench.roofline import int8_matmul_roofline, xla_int8_matmul_roofline
r_xla = xla_int8_matmul_roofline(iters=20)
print(json.dumps({"phase": "ab", "variant": "xla_int8_dot",
                  **{k: round(v, 4) if isinstance(v, float) else v
                     for k, v in r_xla.items()}}), flush=True)
r_pl = int8_matmul_roofline(iters=20, tm=512, tn=512, tk=4096)
print(json.dumps({"phase": "ab", "variant": "pallas_fullk_512_512_4096",
                  **{k: round(v, 4) if isinstance(v, float) else v
                     for k, v in r_pl.items()}}), flush=True)
PYEOF
echo "ab exit=$? $(date -u +%FT%T)" | tee -a $L/job8.status
