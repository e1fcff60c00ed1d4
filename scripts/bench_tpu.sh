#!/usr/bin/env bash
# Headline TPU benchmarks (serialize: never run two TPU processes at once —
# concurrent clients corrupt each other's timings through the relay).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py
python - <<'PY'
import json
from dlq_tpu.bench import roofline as R
for name, fn in [("bf16_xla", R.bf16_matmul_roofline),
                 ("int8_xla", R.xla_int8_matmul_roofline),
                 ("int8_pallas", R.int8_matmul_roofline),
                 ("int4_pallas", R.int4_matmul_roofline)]:
    try:
        print(name, json.dumps(fn(iters=10)))
    except Exception as e:
        print(name, "FAILED", repr(e)[:200])
PY
