#!/bin/bash
# Round-5 TPU job 7: full-K / large-tk tile sweep for the W4A8 and W4A16
# fused matmuls at 4096^3 (the W8A8 full-K win motivates the probe).
cd /root/repo
L=runlogs/r5
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r5 job7 start $(date -u +%FT%T) ===" | tee $L/job7.status
timeout 5400 python - > $L/tiles5.jsonl 2> $L/tiles5.err <<'PYEOF'
import json, sys
sys.path.insert(0, "/root/repo")
from dlq_tpu.platform import apply_platform_env
apply_platform_env()
import numpy as np, jax.numpy as jnp
from dlq_tpu.timing import device_time_fn
from dlq_tpu.ops.pallas_matmul import int4a8_matmul, int4_matmul

M = K = N = 4096
rng = np.random.default_rng(0)
x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
xb = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
wp = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
sc = jnp.full((N,), 1e-3, jnp.float32)
sg = jnp.full((K // 128, N), 1e-2, jnp.float32)

def row(kind, tiles, fn, xarg):
    try:
        r = device_time_fn(fn, xarg, n_small=2, n_big=10)
        tops = 2 * M * N * K / (r["ms_median"] / 1e3) / 1e12
        print(json.dumps({"phase": "tiles5", "kind": kind, "tiles": tiles,
                          "ms": round(r["ms_median"], 4),
                          "tops": round(tops, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"phase": "tiles5", "kind": kind, "tiles": tiles,
                          "error": f"{type(e).__name__}: {str(e)[:160]}"}),
              flush=True)

for tm, tn, tk in ((512, 1024, 2048), (512, 512, 4096), (512, 1024, 4096),
                   (1024, 512, 4096), (512, 512, 2048)):
    row("w4a8", [tm, tn, tk],
        lambda xx, a=tm, b=tn, c=tk: int4a8_matmul(xx, wp, sc, tm=a, tn=b, tk=c),
        x8)
for tm, tn, tk in ((1024, 512, 1024), (512, 512, 4096), (1024, 512, 4096),
                   (512, 512, 2048), (1024, 512, 2048)):
    row("w4a16", [tm, tn, tk],
        lambda xx, a=tm, b=tn, c=tk: int4_matmul(xx, wp, sg, tm=a, tn=b, tk=c),
        xb)
PYEOF
echo "tiles5 exit=$? $(date -u +%FT%T)" | tee -a $L/job7.status
echo "=== r5 job7 done $(date -u +%FT%T) ===" | tee -a $L/job7.status
