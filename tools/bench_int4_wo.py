"""TPU sweep: weight-only INT4 (group-wise G128) model throughput at real
batch sizes — the BENCH_NOTES row for this path was measured at b32 only.

Weight-only deploy dequantizes to the activation dtype per forward (weights
stay int4 in HBM: 8x less residency than fp32), so compute runs at the
fp32 or bf16 conv rate depending on the input dtype. One process:
  r18 W4A16-G128 DeployCtx b256/b384, fp32-in vs bf16-in
  DeiT-Ti W4A16-G128 deploy b256 (bf16-in)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main(iters: int = 8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    )
    from dlq_tpu.quant.model_quant import DeployCtx, quantize_weights
    from dlq_tpu.quant.qconfig import INT4_WEIGHT_ONLY_G128
    from dlq_tpu.timing import device_time_fn

    _emit(device=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    qcfg = INT4_WEIGHT_ONLY_G128

    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    qflat = quantize_weights(flatten_folded(fold_resnet(params, cfg)), qcfg)
    wbytes = sum(p["qw"].nbytes for p in qflat.values())

    def fwd(p, xb):
        return qforward(DeployCtx(p, None, qcfg), xb, cfg)

    for dt, name in ((jnp.float32, "fp32in"), (jnp.bfloat16, "bf16in")):
        for b in (256, 384):
            x = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), dt)
            r = device_time_fn(fwd, qflat, x, perturb_arg=1, n_small=2,
                               n_big=2 + iters)
            _emit(model="resnet18_w4a16g128", compute=name, batch=b,
                  ms=round(r["ms_median"], 3),
                  img_s=round(b / (r["ms_median"] / 1e3), 1),
                  weight_mb=round(wbytes / 1e6, 2))

    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )

    vcfg = ViTConfig()  # deit_tiny defaults
    vp = init_vit(jax.random.PRNGKey(1), vcfg)
    vqf = make_qforward(vit_extras(vp), vcfg.depth, vcfg.heads, vcfg.patch,
                        vcfg.dim, attn_impl="fused")
    vq = quantize_weights(flatten_vit(vp), qcfg)
    vb = sum(p["qw"].nbytes for p in vq.values())
    b = 256
    xv = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.bfloat16)

    def vfwd(p, xb):
        return vqf(DeployCtx(p, None, qcfg), xb, vcfg)

    r = device_time_fn(vfwd, vq, xv, perturb_arg=1, n_small=2, n_big=2 + iters)
    _emit(model="deit_tiny_w4a16g128", compute="bf16in", batch=b,
          ms=round(r["ms_median"], 3),
          img_s=round(b / (r["ms_median"] / 1e3), 1),
          weight_mb=round(vb / 1e6, 2))


if __name__ == "__main__":
    main()
