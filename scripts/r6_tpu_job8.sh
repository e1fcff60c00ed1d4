#!/bin/bash
# Round-6 TPU job 8: defense re-measure of the DeiT flagship rows on
# today's toolchain (W8A8 stacked-L6 43.6k and W4A8 cache-unpack 42.1k,
# both last measured r4/r5) — cross-round variance evidence for the
# transformer family, mirroring the conv headline's band discipline.
cd /root/repo
L=runlogs/r6
export DLQ_COMPILE_CACHE=$HOME/.cache/dlq_xla
echo "=== r6 job8 start $(date -u +%FT%T) ===" | tee $L/job8.status
timeout 5400 python - > $L/deit_confirm.jsonl 2> $L/deit_confirm.err <<'PY'
import json, sys
sys.path.insert(0, "/root/repo")
from dlq_tpu.platform import apply_platform_env
apply_platform_env()
import numpy as np
import jax, jax.numpy as jnp
from dlq_tpu.models.vit import (ViTConfig, flatten_vit, init_vit,
                                make_qforward, vit_extras)
from dlq_tpu.ops.pallas_vit_block import (
    pack_vit_blocks_w8, stack_vit_blocks_w8, vit_forward_multiblock_w8,
    pack_vit_blocks_w4a8, vit_forward_blockfused_w4a8c)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT8_PER_CHANNEL
from dlq_tpu.timing import device_time_fn

batch = 384
cfg = ViTConfig()
params = init_vit(jax.random.PRNGKey(0), cfg)
flat = flatten_vit(params)
ex = vit_extras(params)
qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                   attn_impl="xla")
rng = np.random.default_rng(0)
calib = [jnp.asarray(rng.normal(0, 1, (16, 224, 224, 3)), jnp.float32)]
x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

s8 = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
q8 = quantize_weights(flat, INT8_PER_CHANNEL)
packed = pack_vit_blocks_w8(q8, s8, ex, cfg, tight=True)
stacked = dict(packed)
stacked["_chunks"] = stack_vit_blocks_w8(packed, 6)
stacked.pop("blocks")
r = device_time_fn(
    lambda p, xx: vit_forward_multiblock_w8(p, xx, cfg, bt=4, tight=True),
    stacked, x, perturb_arg=1, n_small=2, n_big=10)
print(json.dumps({"variant": "w8a8_stacked_L6_bt4", "batch": batch,
                  "ms": round(float(r["ms_median"]), 3),
                  "img_s": round(batch / (r["ms_median"] / 1e3), 1)}),
      flush=True)

s4 = calibrate(make_sites_fn(qf, cfg), flat, calib, INT4A8_PER_CHANNEL)
q4 = quantize_weights(flat, INT4A8_PER_CHANNEL)
p4 = pack_vit_blocks_w4a8(q4, s4, ex, cfg, tight=True)
r = device_time_fn(
    lambda p, xx: vit_forward_blockfused_w4a8c(p, xx, cfg, bt=8, tight=True),
    p4, x, perturb_arg=1, n_small=2, n_big=10)
print(json.dumps({"variant": "w4a8_cacheunpack_bt8", "batch": batch,
                  "ms": round(float(r["ms_median"]), 3),
                  "img_s": round(batch / (r["ms_median"] / 1e3), 1)}),
      flush=True)
PY
echo "deit confirm exit=$? $(date -u +%FT%T)" | tee -a $L/job8.status
echo "=== r6 job8 done $(date -u +%FT%T) ===" | tee -a $L/job8.status
