#!/usr/bin/env python
"""dlq_tpu quickstart: train -> quantize -> deploy -> serve, end to end.

Runs on CPU (DLQ_PLATFORM=cpu python examples/quickstart.py) or TPU.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlq_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.engine import Engine
from dlq_tpu.models.resnet import (
    ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward, resnet_forward,
)
from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
from dlq_tpu.quant.store import save_quantized
from dlq_tpu.serving import InferenceServer

# 1. a model (random weights here; load_params for a real store)
cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
params = init_resnet(jax.random.PRNGKey(0), cfg)
flat = flatten_folded(fold_resnet(params, cfg))

# 2. PTQ to W8A8 with one calibration batch
rng = np.random.default_rng(0)
calib = [jnp.asarray(rng.normal(0, 1, (16, 32, 32, 3)), jnp.float32)]
engine = Engine.quantized(qforward, flat, cfg, INT8_PER_CHANNEL,
                          calib_batches=calib, batch=16)

# 3. accuracy check vs fp32
x = rng.normal(0, 1, (16, 32, 32, 3)).astype(np.float32)
fp32 = np.asarray(resnet_forward(params, jnp.asarray(x), cfg))
int8 = np.asarray(engine(x))
print("top-1 agreement:", numerics.top1_agreement(int8, fp32),
      "cosine:", round(numerics.diff(int8, fp32).cosine, 5))

# 4. persist the deployable artifact + cold-start a fresh engine from it
store = os.path.join(tempfile.mkdtemp(), "r18_int8")
save_quantized(store, "resnet18", engine.qflat, engine.act_scales, INT8_PER_CHANNEL,
               meta={"config": {"num_classes": 10, "small_input": True}})
engine2 = Engine.from_store(store, batch=16)
assert np.array_equal(np.asarray(engine2(x)), int8)
print("cold-start from store: bit-exact")

# 5. serve: continuous batcher with per-request latency stats and a
#    zero-downtime weight swap at a batch boundary
srv = InferenceServer(engine2, max_wait_ms=5.0).start()
pred = srv.infer(x[0])
srv.swap_engine(Engine.from_store(store, batch=16))  # e.g. a new release
pred2 = srv.infer(x[0])
lat = srv.latency_stats()
srv.stop()
assert np.allclose(pred, pred2)
print(f"served 2 requests (hot swap between) -> class {int(np.argmax(pred))},"
      f" p50 {lat['p50_ms']:.1f} ms")

# 6. the int4 toolbox: GPTQ rounding + W4A8 (half the weight bytes, int8
#    conv rate) through the same deploy surface
from dlq_tpu.quant.gptq import bias_correct, collect_hessians, gptq_quantize_weights
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

scales4 = calibrate(make_sites_fn(qforward, cfg), flat, calib, INT4A8_PER_CHANNEL)
col = collect_hessians(qforward, flat, cfg, calib)
q4 = bias_correct(flat, gptq_quantize_weights(flat, INT4A8_PER_CHANNEL, col), col)
int4 = np.asarray(qforward(DeployCtx(q4, scales4, INT4A8_PER_CHANNEL),
                           jnp.asarray(x), cfg))
w8 = sum(p["qw"].nbytes for p in engine.qflat.values())
w4 = sum(p["qw"].nbytes for p in q4.values())
print(f"W4A8+GPTQ: cosine {numerics.diff(int4, fp32).cosine:.4f} "
      f"weights {w8/1e6:.1f} MB -> {w4/1e6:.1f} MB")

# 7. a REAL image file through the deployment input path: JPEG bytes ->
#    decode -> native preprocess -> engine classify (the journey a serving
#    deployment runs; tests/test_real_image_e2e.py gates it in CI)
from PIL import Image

from dlq_tpu.native import preprocess_batch_u8

img_path = os.path.join(tempfile.mkdtemp(), "sample.jpg")
rng2 = np.random.default_rng(7)
Image.fromarray(rng2.integers(0, 255, (300, 280, 3), dtype=np.uint8)).save(
    img_path, quality=92)
u8 = np.asarray(Image.open(img_path).convert("RGB"))
xin = preprocess_batch_u8([u8], size=32)  # this model is 32px small-input
pred_file = int(engine2.classify(xin)[0])
print(f"classified {os.path.basename(img_path)} -> class {pred_file}")
