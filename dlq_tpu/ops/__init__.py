"""Op/kernel layer — the TPU-native replacement of the reference's CUDA
kernel zoo (`cpp/fp32/kernels/*.cu`, SURVEY §2.1).

Mapping (reference kernel -> TPU-native op):
  im2col + sgemm_tiled  -> XLA conv on MXU (no materialized im2col) and
                           Pallas fused dequant+matmul for quantized paths
  bn_inference          -> affine fold / fused elementwise epilogue
  relu / add            -> XLA-fused elementwise
  maxpool / gap         -> lax.reduce_window / mean
  softmax_1d            -> jax.nn.softmax

Quantized ops accumulate in int32 on the MXU and rescale in fp32.
"""

from dlq_tpu.ops.qops import qconv2d, qdense, int8_conv_supported  # noqa: F401
