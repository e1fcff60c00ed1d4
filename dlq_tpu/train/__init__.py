"""Training: the MNIST MLP ladder (ref: CUDA/MNIST_on_GPU v1-v5) rebuilt
TPU-first, plus the shared data contract and timing harness."""

from dlq_tpu.train.mlp_train import TrainConfig, sgd_train_step, train_mlp  # noqa: F401
