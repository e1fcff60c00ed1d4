"""Post-training quantization: the "Q" the reference was building toward.

The reference reserved a per-tensor ``quant`` block in its manifest for
"INT8/INT2 later" (`reports/Step1.md:92`, `reports/Step2.md:164-168`); this
package implements it: scale/zero-point calibration (minmax + percentile,
per-tensor and per-channel), symmetric INT8 weight/activation PTQ, group-wise
INT4 weight-only PTQ with nibble packing, and the per-layer quant-error
reporting harness.
"""

from dlq_tpu.quant.qconfig import QConfig, QScheme  # noqa: F401
from dlq_tpu.quant.quantize import (  # noqa: F401
    QTensor,
    dequantize,
    pack_int4,
    quantize_tensor,
    unpack_int4,
)
