"""Golden-fixture differential tests vs the torch oracle — the reference's
step2..step8 validation ladder (SURVEY §4) as one pytest parameterization
instead of per-step binaries. Gate: max_abs <= 1e-4 per stage (the
reference's FP32 reorder tolerance, reports/Step2.md:135-137)."""

import jax
import numpy as np
import pytest

from dlq_tpu import numerics
from dlq_tpu.models.mlp import MLPConfig, init_mlp, mlp_forward
from dlq_tpu.models.resnet import ResNetConfig, init_resnet, resnet_forward
from dlq_tpu.interop.torch_oracle import torch_mlp_logits, torch_resnet_taps

ATOL = 1e-4

STAGES = ["stem", "layer1", "layer2", "layer3", "layer4", "gap", "logits"]


@pytest.fixture(scope="module")
def resnet_small():
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    logits, taps = jax.jit(lambda p, xx: resnet_forward(p, xx, cfg, taps=True))(params, x)
    golden = torch_resnet_taps(params, cfg, x)
    return taps, golden


@pytest.mark.parametrize("stage", STAGES)
def test_resnet18_stage_parity(resnet_small, stage):
    """Stage-by-stage ladder: any stage over gate localizes the divergence
    (replaces the reference's --dump_dir + diag_e2e_compare workflow)."""
    taps, golden = resnet_small
    d = numerics.check(np.asarray(taps[stage]), golden[stage], atol=ATOL, what=stage)
    assert d.cosine > 0.9999


def test_resnet18_imagenet_shape_e2e():
    """Full 224px topology (stem stride-2 + maxpool path) vs torch."""
    cfg = ResNetConfig(depth=18, num_classes=50)
    params = init_resnet(jax.random.PRNGKey(1), cfg)
    x = np.random.default_rng(1).normal(0, 1, (1, 224, 224, 3)).astype(np.float32)
    logits = jax.jit(lambda p, xx: resnet_forward(p, xx, cfg))(params, x)
    golden = torch_resnet_taps(params, cfg, x)
    numerics.check(np.asarray(logits), golden["logits"], atol=ATOL, what="logits_224")


def test_mlp_parity():
    cfg = MLPConfig()
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).normal(0, 1, (8, 784)).astype(np.float32)
    ours = jax.jit(lambda p, xx: mlp_forward(p, xx, cfg))(params, x)
    golden = torch_mlp_logits(params, x)
    numerics.check(np.asarray(ours), golden, atol=ATOL, what="mlp_logits")


def test_top1_agreement_batch():
    """Statistical e2e test (reference step9 methodology): 100% top-1
    agreement with the oracle over a batch of random images."""
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(2), cfg)
    x = np.random.default_rng(2).normal(0, 1, (16, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(jax.jit(lambda p, xx: resnet_forward(p, xx, cfg))(params, x))
    golden = torch_resnet_taps(params, cfg, x)["logits"]
    assert numerics.top1_agreement(ours, golden) == 1.0
    assert numerics.diff(ours, golden).cosine > 0.99999


def test_mobilenetv2_parity():
    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, init_mobilenetv2, mobilenetv2_forward,
    )
    from dlq_tpu.interop.torch_oracle import torch_mobilenetv2_taps

    cfg = MobileNetV2Config(num_classes=10, small_input=True, width_mult=0.5)
    params = init_mobilenetv2(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ours, taps = jax.jit(lambda p, xx: mobilenetv2_forward(p, xx, cfg, taps=True))(params, x)
    golden = torch_mobilenetv2_taps(params, cfg, x)
    for stage in ("block0", "block5", "block16", "gap", "logits"):
        numerics.check(np.asarray(taps[stage]), golden[stage], atol=1e-4, what=f"mnv2_{stage}")


def test_deit_tiny_parity():
    from dlq_tpu.models.vit import ViTConfig, init_vit, vit_forward
    from dlq_tpu.interop.torch_oracle import torch_vit_logits

    cfg = ViTConfig(image_size=32, patch=4, dim=96, depth=3, heads=3, num_classes=10)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = jax.jit(lambda p, xx: vit_forward(p, xx, cfg))(params, x)
    golden = torch_vit_logits(params, cfg, x)
    numerics.check(np.asarray(ours), golden, atol=1e-4, what="vit_logits")


def test_resnet50_bottleneck_parity():
    """ResNet-50 bottleneck topology vs the torch oracle at 1e-4."""
    cfg = ResNetConfig(depth=50, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(4), cfg)
    x = np.random.default_rng(4).normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ours, taps = jax.jit(lambda p, xx: resnet_forward(p, xx, cfg, taps=True))(params, x)
    golden = torch_resnet_taps(params, cfg, x)
    # random-init deep bottleneck nets amplify activation magnitudes, so the
    # late stages gate on RELATIVE error (abs gates assume trained-scale
    # activations); early stages keep the reference's 1e-4 abs gate
    for stage in ("stem", "layer1"):
        numerics.check(np.asarray(taps[stage]), golden[stage], atol=1e-4,
                       what=f"r50_{stage}")
    for stage in ("layer4", "logits"):
        d = numerics.diff(np.asarray(taps[stage]), golden[stage])
        assert d.rel_l2 < 1e-5 and d.cosine > 0.999999, (stage, d)
