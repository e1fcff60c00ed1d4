"""Quantization configuration dataclasses (the single config system the
reference lacked — SURVEY §5.6 calls for dataclass config over argv parsing)."""

from __future__ import annotations

import dataclasses
import fnmatch
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class QScheme:
    """How one tensor class (weights or activations) is quantized.

    bits:      8 (int8), 4 (int4), or 2 (int2 — the reference's stated
               INT2 experiment target, reports/Step2.md:164-168; QAT/simulate
               and int8-compute deploy, no packed storage)
    symmetric: symmetric (zero_point=0) vs affine
    axis:      per-channel axis in the tensor's stored layout; None = per-tensor.
               For HWIO conv weights and IO dense weights the output-channel
               axis is -1.
    group:     group size along the contraction (input-channel) axis for
               group-wise scales (int4 weight-only, e.g. 128); None = whole axis.
    """

    bits: int = 8
    symmetric: bool = True
    axis: Optional[int] = -1
    group: Optional[int] = None

    def __post_init__(self):
        if self.bits not in (2, 4, 8):
            raise ValueError(f"bits must be 2, 4 or 8, got {self.bits}")
        if self.bits != 8 and not self.symmetric:
            raise ValueError("sub-8-bit paths are symmetric-only")

    @property
    def qmax(self) -> int:
        return {8: 127, 4: 7, 2: 1}[self.bits]

    @property
    def qmin(self) -> int:
        if self.symmetric:
            return -self.qmax
        return -(2 ** (self.bits - 1))


@dataclasses.dataclass(frozen=True)
class QConfig:
    """Whole-model PTQ recipe."""

    weights: QScheme = QScheme(bits=8, symmetric=True, axis=-1)
    acts: Optional[QScheme] = QScheme(bits=8, symmetric=True, axis=None)  # None => weight-only
    calibration: str = "minmax"  # "minmax" | "percentile" | "mse"
    percentile: float = 99.99
    # mixed precision: (fnmatch pattern, scheme) pairs consulted in order;
    # first match wins, else `weights`. The standard INT4 recipe keeps the
    # quantization-sensitive stem/head at int8:
    #   weight_overrides=(("stem", QScheme(8, True, -1)),
    #                     ("fc", QScheme(8, True, -1)))
    weight_overrides: Tuple[Tuple[str, QScheme], ...] = ()

    @property
    def weight_only(self) -> bool:
        return self.acts is None

    def scheme_for(self, site: str) -> QScheme:
        """Weight scheme for one site (mixed-precision lookup)."""
        for pattern, scheme in self.weight_overrides:
            if fnmatch.fnmatch(site, pattern):
                return scheme
        return self.weights


# Preset recipes matching BASELINE.json configs
INT8_PER_TENSOR = QConfig(weights=QScheme(8, True, None), acts=QScheme(8, True, None))
INT8_PER_CHANNEL = QConfig(weights=QScheme(8, True, -1), acts=QScheme(8, True, None))
INT4_WEIGHT_ONLY_G128 = QConfig(weights=QScheme(4, True, -1, group=128), acts=None)
# per-OC weight-only int4: coarser than G128 but kernel-friendly — the W4A16
# fused ViT block kernel and the W4A8 paths fold per-OC scales into their
# f32 epilogues (group scales cannot fold). Also the right recipe when K is
# not a multiple of the group (DeiT-Ti: K=192 sites fall back to int8 under
# G128, silently losing the 4-bit storage).
INT4_WEIGHT_ONLY_PER_OC = QConfig(weights=QScheme(4, True, -1), acts=None)
# W4A8: int4 per-OC weights + int8 activations — dense sites run on the MXU
# int8 rate with an in-register nibble unpack (ops/pallas_matmul.int4a8_matmul);
# conv sites unpack in-graph (exact) onto XLA's int8 conv (ops/qops.qconv2d).
# Odd-K sites (the C=3 stems) fall back to int8 per-channel automatically.
INT4A8_PER_CHANNEL = QConfig(weights=QScheme(4, True, -1), acts=QScheme(8, True, None))
