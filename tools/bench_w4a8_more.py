"""TPU sweep: W4A8 follow-ups in one process.

  1. ResNet-18 int4 store with int4_runtime="int8" (unpack at load) — must
     recover the full W8A8 rate (the 11% in-graph-unpack cost vanishes).
  2. ResNet-18 W4A8 packed-runtime batch sweep (the per-forward unpack is
     per-batch; larger batches amortize it).
  3. MobileNetV2 W4A8 vs W8A8 at b384 (depthwise family: dw sites are int8
     by the odd-K fallback; expand/project 1x1s carry the int4).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main(iters: int = 8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT8_PER_CHANNEL
    from dlq_tpu.quant.store import save_quantized
    from dlq_tpu.timing import device_time_fn

    _emit(device=str(jax.devices()[0]))
    rng = np.random.default_rng(0)

    # --- ResNet-18: store once, run both int4 runtimes + batch sweep -----
    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                       INT4A8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT4A8_PER_CHANNEL)
    store = os.path.join(tempfile.mkdtemp(prefix="dlq_w4a8_"), "r18")
    save_quantized(store, "resnet18", qflat, scales, INT4A8_PER_CHANNEL,
                   meta={"config": {"num_classes": 1000}})

    for runtime, batches in (("int8", (384,)), ("packed", (384, 512, 768))):
        for b in batches:
            eng = Engine.from_store(store, ctx="fused2", batch=b,
                                    int4_runtime=runtime)
            x = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)
            r = device_time_fn(eng._fn, eng.params, x, perturb_arg=1,
                               n_small=2, n_big=2 + iters)
            _emit(model="resnet18", variant=f"w4a8_{runtime}", batch=b,
                  ms=round(r["ms_median"], 3),
                  img_s=round(b / (r["ms_median"] / 1e3), 1))

    # --- MobileNetV2 W4A8 vs W8A8 (DeployCtx, the MNv2 production path) --
    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, block_meta, fold_mobilenetv2, init_mobilenetv2,
        make_qforward,
    )
    from dlq_tpu.quant.model_quant import DeployCtx

    mcfg = MobileNetV2Config(num_classes=1000)
    mparams = init_mobilenetv2(jax.random.PRNGKey(1), mcfg)
    mflat = fold_mobilenetv2(mparams)
    mqf = make_qforward(block_meta(mcfg))
    mcalib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    b = 384
    xm = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)
    for name, qc in (("w8a8", INT8_PER_CHANNEL), ("w4a8", INT4A8_PER_CHANNEL)):
        msc = calibrate(make_sites_fn(mqf, mcfg), mflat, mcalib, qc)
        mq = quantize_weights(mflat, qc)
        wbytes = sum(p["qw"].nbytes for p in mq.values())

        def fwd(p, xb, _q=qc):
            return mqf(DeployCtx(p["qflat"], p["scales"], _q), xb, mcfg)

        r = device_time_fn(fwd, {"qflat": mq, "scales": msc}, xm,
                           perturb_arg=1, n_small=2, n_big=2 + iters)
        _emit(model="mobilenetv2", variant=name, batch=b,
              ms=round(r["ms_median"], 3),
              img_s=round(b / (r["ms_median"] / 1e3), 1),
              weight_mb=round(wbytes / 1e6, 2))


if __name__ == "__main__":
    main()
