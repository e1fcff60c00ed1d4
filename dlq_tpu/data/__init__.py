"""Data layer: MNIST .bin contract, ImageNet-style preprocessing, synthetic
generators (the reference's L0, SURVEY §1)."""

from dlq_tpu.data.mnist import load_mnist_bin, synthetic_mnist  # noqa: F401
from dlq_tpu.data.preprocess import imagenet_preprocess_np  # noqa: F401
