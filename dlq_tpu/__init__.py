"""dlq_tpu — a TPU-native quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
yeontachi/DLQ ("Deep Learning Quantization Lab"):

* manifest-driven weight export / interchange        (ref: tools/export_resnet18.py)
* from-scratch kernel-level CNN inference engine     (ref: cpp/fp32/{kernels,runtime})
* golden-fixture numeric parity harness              (ref: tools/make_step*_fixture.py)
* per-op / per-stage timing instrumentation          (ref: runtime/utils.hpp Timer)
* feature-map inspection                             (ref: DeepLearning/CheckFeaturemap)
* structured per-run metric logging                  (ref: Excel_logger/excel_logger.py)
* the MNIST MLP training ladder                      (ref: CUDA/MNIST_on_GPU v1-v5)

plus the post-training quantization the reference was building toward:
per-tensor / per-channel INT8 and group-wise INT4 weight-only PTQ with
fused dequant+matmul / dequant+conv Pallas kernels, sharded over TPU
meshes with GSPMD.
"""

__version__ = "0.1.0"

from dlq_tpu import numerics  # noqa: F401
from dlq_tpu.manifest import Manifest, TensorMeta  # noqa: F401
