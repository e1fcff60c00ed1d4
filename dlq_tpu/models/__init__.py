"""Model zoo: functional JAX modules (pure init/apply pairs over param pytrees).

Families mirror the reference + BASELINE configs:
  * ``mlp``        — MNIST 784-256-10 MLP (ref: CUDA/MNIST_on_GPU v1-v5)
  * ``lenet5``     — LeNet-5 CNN for MNIST (BASELINE config 1)
  * ``resnet``     — ResNet-18/34 (ref: CUDA/resnet18-kernel-lab)
  * ``mobilenetv2``— depthwise-conv stress model (BASELINE config 4)
  * ``vit``        — Tiny ViT / DeiT-Ti (BASELINE config 5)
"""

from dlq_tpu.models.registry import available, get_model, register  # noqa: F401
