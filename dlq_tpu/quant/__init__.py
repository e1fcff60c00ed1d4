"""Quantization lab: the "Q" the reference was building toward — and the
full modern toolbox around it.

The reference reserved a per-tensor ``quant`` block in its manifest for
"INT8/INT2 later" (`reports/Step1.md:92`, `reports/Step2.md:164-168`); this
package implements it and goes further:

  calibrate.py    minmax / percentile / MSE activation-scale calibration
  quantize.py     QTensor, symmetric int8/int4/int2, per-tensor/-OC/-group
  qconfig.py      dataclass recipes + per-site mixed-precision overrides
  model_quant.py  observe/deploy(+dynamic)/fused/fully-fused/simulate ctxs
  gptq.py         Hessian-aware rounding + analytic bias correction
  smooth.py       SmoothQuant outlier migration (+AWQ-style auto-alpha)
  sensitivity.py  per-site damage scores -> automatic mixed precision
  recipe.py       ptq_auto: the composed one-call pipeline
  qat.py          clipped-STE quantization-aware training (bits 8/4/2)
  store.py        deployable quantized manifest (cold-start artifact)
  error_report.py per-layer quant-error / Δtop-1 harness
"""

from dlq_tpu.quant.qconfig import QConfig, QScheme  # noqa: F401
from dlq_tpu.quant.quantize import (  # noqa: F401
    QTensor,
    dequantize,
    pack_int4,
    quantize_tensor,
    unpack_int4,
)
