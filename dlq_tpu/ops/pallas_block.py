"""Pallas TPU fused residual-block kernels (W8A8, fully-int8 interchange).

One kernel per IDENTITY residual block (stride-1, no downsample): the whole
block — conv chain, per-conv requant, int8 residual add, relu — runs on one
VMEM-resident slab per (batch-group) program, crossing HBM once in and once
out. This is the ResNet analogue of the fused ViT block kernel
(ops/pallas_vit_block.py) and removes the inter-op HBM traffic that
FullFusedCtx still pays between convs (BENCH_NOTES: l2 stage 0.99 ms vs a
0.57 ms conv-compute floor at b256).

Two shapes:
  * basic_block_fused      — BasicBlock: 3x3 -> 3x3 (+x) relu   (resnet18/34)
  * bottleneck_block_fused — Bottleneck: 1x1 -> 3x3 -> 1x1 (+x) (resnet50+)

Strided/downsample blocks stay on the XLA path: Mosaic on this backend
rejects strided sublane slices (tools/probe_block_patterns.py probe S), so
stride-2 taps cannot be expressed in-kernel. Identity blocks are 5/8 of
resnet18 and 12/16 of resnet50.

Numerics contract = FullFusedCtx composition (quant/model_quant.py):
  h   = clip(round((acc1*comb1 + b1) * inv_mid), 0, 127)      # conv1+relu
  z   = clip(round((acc2*comb2 + b2) * inv_nxt), -127, 127)   # conv2
  r   = clip(round(x * s_in * inv_nxt), -127, 127)            # requant skip
  out = clip(z + r, 0, 127)                                   # add_relu
with int32 conv accumulation on the MXU (int8 x int8). The only deviation
from the XLA path is fp32 reassociation in the folded epilogue scales
(comb/s_out vs comb then /s_out), which can flip values sitting exactly on
a rounding boundary — measured ~1e-4 of elements, gated in tests.

Mosaic patterns used (probed green on v5e, tools/probe_block_patterns.py
probe D + tools/probe_block_variants.py): 4D int8 slabs with
channels-on-lanes (>=128), unaligned sublane slices for conv taps,
leading-dim merge reshapes for flat dots, int8 scratch interchange, int8
4D output blocks. Probed RED and therefore avoided: kw lane-concat for
K=3C dots (wide_k=True — "unsupported shape cast") and any 64-lane
interchange (C=64 BasicBlocks are left on XLA; Bottleneck mid-channels
are zero-padded to 128 in the pack).

Reference analogue: the reference's per-step CUDA BasicBlock drivers
(`runtime/infer_layer1.cu:201-289`) run conv/bn/relu/add as separate
kernels with device-wide syncs; this is the TPU-native inversion: one
fused kernel per block.

STATUS (v5e, measured — tools/bench_block_fused.py): correct (top-1
agreement 1.0, cosine >0.9999 vs FullFusedCtx) but SLOWER at model level
(resnet18 9.4 vs 5.4 ms/b256, resnet50 20.6 vs 7.1 ms/b128). Root cause is
the same ceiling pallas_conv hit: with the wide-K dot form rejected by
Mosaic, the per-tap K=C int8 dots + the 9 slab-slice relayouts per conv run
the MXU far below XLA's 93-95% conv efficiency, and that loss outweighs the
saved interchange traffic. XLA's FullFusedCtx composition remains the
production ResNet path; these kernels are kept as the working substrate for
a future Mosaic that accepts the K=3C concat (wide_k=True).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _conv3x3_flat(slab, w3, *, tb, oh, ow, cin, wide_k=True):
    """3x3/s1 conv on a [tb, oh+2, >=ow+2, cin] int8 slab region. wide_k:
    three K=3*cin flat dots (kw taps lane-concatenated — better int8 MXU
    K-packing); else nine K=cin dots (the pallas_conv-proven fallback).
    w3: [3, 3*cin, oc]. Returns int32 [tb*oh*ow, oc]."""
    rows = tb * oh * ow
    acc = None
    for kh in range(3):
        if wide_k:
            a = jnp.concatenate(
                [slab[:, kh : kh + oh, kw : kw + ow, :] for kw in range(3)],
                axis=-1,
            ).reshape(rows, 3 * cin)
            d = jax.lax.dot(a, w3[kh], preferred_element_type=jnp.int32)
        else:
            d = None
            for kw in range(3):
                a = slab[:, kh : kh + oh, kw : kw + ow, :].reshape(rows, cin)
                dd = jax.lax.dot(a, w3[kh, kw * cin : (kw + 1) * cin, :],
                                 preferred_element_type=jnp.int32)
                d = dd if d is None else d + dd
        acc = d if acc is None else acc + d
    return acc


def _requant(acc, scale_ref, bias_ref, inv, lo, hi):
    y = (acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]) * inv
    return jnp.clip(jnp.round(y), lo, hi).astype(jnp.int8)


def _zero_halo(h, *, TB, H, W, flat=True):
    """Zero the 1-pixel halo ring of the conv1 output: the XLA composition's
    conv2 sees zero padding there, while the in-kernel conv1 computed over
    the haloed region produces bias/partial-input values. h: [TB*(H+2)*(W+2),
    C] flat (flat=True, 2D iota on the row dim) or [TB, H+2, W+2, C]."""
    if flat:
        p = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        i = jax.lax.rem(p // (W + 2), H + 2)
        j = jax.lax.rem(p, W + 2)
        ok = (i > 0) & (i <= H) & (j > 0) & (j <= W)
        return jnp.where(ok, h, jnp.zeros_like(h))
    ii = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, h.shape, 2)
    ok = (ii > 0) & (ii <= H) & (jj > 0) & (jj <= W)
    return jnp.where(ok, h, jnp.zeros_like(h))


def _pick_tb(per_image_bytes: int, n: int, cap: int = 8,
             budget: int = 6 * 1024 * 1024) -> int:
    tb = max(1, min(cap, budget // max(per_image_bytes, 1)))
    while n % tb:
        tb -= 1
    return tb


def _basic_kernel(x_ref, inv_ref, w1_ref, s1_ref, b1_ref,
                  w2_ref, s2_ref, b2_ref, o_ref, h_scr,
                  *, TB, H, W, C, OC, wide_k, flat_mask):
    """x_ref: [TB, H+4, Wp, C] int8 (spatial pad 2, channels padded >=128).
    inv_ref: SMEM [1,3] = (1/s_mid, 1/s_nxt, s_in/s_nxt)."""
    inv_mid, inv_nxt, rs = inv_ref[0, 0], inv_ref[0, 1], inv_ref[0, 2]
    # conv1 over the haloed region (H+2)x(W+2), relu folded into the clip
    acc1 = _conv3x3_flat(x_ref, w1_ref, tb=TB, oh=H + 2, ow=W + 2, cin=C,
                         wide_k=wide_k)
    h = _requant(acc1, s1_ref, b1_ref, inv_mid, 0.0, 127.0)
    if flat_mask:
        h = _zero_halo(h, TB=TB, H=H, W=W, flat=True)
        h_scr[:] = h.reshape(TB, H + 2, W + 2, OC)
    else:
        h_scr[:] = _zero_halo(h.reshape(TB, H + 2, W + 2, OC),
                              TB=TB, H=H, W=W, flat=False)
    # conv2 over the valid HxW region
    acc2 = _conv3x3_flat(h_scr, w2_ref, tb=TB, oh=H, ow=W, cin=OC,
                         wide_k=wide_k)
    z = (acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:]) * inv_nxt
    z = jnp.clip(jnp.round(z), -127.0, 127.0)
    # requantized identity skip from the slab center (valid channels only)
    xc = x_ref[:, 2 : 2 + H, 2 : 2 + W, :OC].reshape(TB * H * W, OC)
    r = jnp.clip(jnp.round(xc.astype(jnp.float32) * rs), -127.0, 127.0)
    out = jnp.clip(z + r, 0.0, 127.0).astype(jnp.int8)
    o_ref[:] = out.reshape(TB, H, W, OC)


@functools.partial(jax.jit, static_argnames=("tb", "interpret", "wide_k",
                                              "flat_mask"))
def basic_block_fused(x: jnp.ndarray, pack: Dict[str, jnp.ndarray],
                      tb: Optional[int] = None,
                      interpret: Optional[bool] = None,
                      wide_k: bool = False, flat_mask: bool = True) -> jnp.ndarray:
    """Identity BasicBlock on int8 activations. x: [N, H, W, C] int8 at the
    conv1 site scale; returns [N, H, W, C] int8 at the next site scale."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, H, W, C = x.shape
    OC = pack["s1"].shape[-1]
    CP = max(C, 128)
    Wp = _cdiv(W + 4, 8) * 8
    if tb is None:
        # principal per-image VMEM: slab + h scratch + int32 acc (lane-128)
        per_img = ((H + 4) * Wp * CP + (H + 2) * (W + 2) * max(OC, 128)
                   + (H + 2) * (W + 2) * max(OC, 128) * 4)
        tb = _pick_tb(per_img, N)
    while N % tb:
        tb //= 2
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, Wp - W - 2), (0, CP - C)))
    kernel = functools.partial(_basic_kernel, TB=tb, H=H, W=W, C=CP, OC=OC,
                               wide_k=wide_k, flat_mask=flat_mask)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(N // tb,),
        in_specs=[
            pl.BlockSpec((tb, H + 4, Wp, CP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((3, 3 * CP, OC)), full((1, OC)), full((1, OC)),
            full((3, 3 * OC, OC)), full((1, OC)), full((1, OC)),
        ],
        out_specs=pl.BlockSpec((tb, H, W, OC), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, OC), jnp.int8),
        scratch_shapes=[pltpu.VMEM((tb, H + 2, W + 2, OC), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * ((H + 2) * (W + 2) + H * W) * 9 * CP * OC,
            bytes_accessed=N * (H + 4) * Wp * CP + N * H * W * OC
            + 9 * (CP + OC) * OC,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, pack["inv"], pack["w1"], pack["s1"], pack["b1"],
      pack["w2"], pack["s2"], pack["b2"])


def _bottleneck_kernel(x_ref, inv_ref, w1_ref, s1_ref, b1_ref,
                       w2_ref, s2_ref, b2_ref, w3_ref, s3_ref, b3_ref,
                       o_ref, h1_scr,
                       *, TB, H, W, C4, CM, wide_k, flat_mask):
    """x_ref: [TB, H+2, Wp, C4] int8 (spatial pad 1 for the 3x3's halo).
    inv_ref: SMEM [1,4] = (1/s2_site, 1/s3_site, 1/s_nxt, s_in/s_nxt)."""
    inv_h1, inv_h2, inv_nxt, rs = (inv_ref[0, 0], inv_ref[0, 1],
                                   inv_ref[0, 2], inv_ref[0, 3])
    rows1 = TB * (H + 2) * (W + 2)
    # conv1 1x1 (C4 -> CM) over the haloed region, relu
    a = x_ref[:, :, : W + 2, :].reshape(rows1, x_ref.shape[-1])
    acc1 = jax.lax.dot(a, w1_ref[:], preferred_element_type=jnp.int32)
    h1 = _requant(acc1, s1_ref, b1_ref, inv_h1, 0.0, 127.0)
    if flat_mask:
        h1 = _zero_halo(h1, TB=TB, H=H, W=W, flat=True)
        h1_scr[:] = h1.reshape(TB, H + 2, W + 2, CM)
    else:
        h1_scr[:] = _zero_halo(h1.reshape(TB, H + 2, W + 2, CM),
                               TB=TB, H=H, W=W, flat=False)
    # conv2 3x3/s1 (CM -> CM) over the valid HxW region, relu
    acc2 = _conv3x3_flat(h1_scr, w2_ref, tb=TB, oh=H, ow=W, cin=CM,
                         wide_k=wide_k)
    h2 = _requant(acc2, s2_ref, b2_ref, inv_h2, 0.0, 127.0)
    # conv3 1x1 (CM -> C4), no relu; fused with the int residual junction
    acc3 = jax.lax.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
    z = (acc3.astype(jnp.float32) * s3_ref[:] + b3_ref[:]) * inv_nxt
    z = jnp.clip(jnp.round(z), -127.0, 127.0)
    OC = o_ref.shape[-1]
    xc = x_ref[:, 1 : 1 + H, 1 : 1 + W, :OC].reshape(TB * H * W, OC)
    r = jnp.clip(jnp.round(xc.astype(jnp.float32) * rs), -127.0, 127.0)
    out = jnp.clip(z + r, 0.0, 127.0).astype(jnp.int8)
    o_ref[:] = out.reshape(TB, H, W, OC)


@functools.partial(jax.jit, static_argnames=("tb", "interpret", "wide_k",
                                              "flat_mask"))
def bottleneck_block_fused(x: jnp.ndarray, pack: Dict[str, jnp.ndarray],
                           tb: Optional[int] = None,
                           interpret: Optional[bool] = None,
                           wide_k: bool = False,
                           flat_mask: bool = True) -> jnp.ndarray:
    """Identity Bottleneck on int8 activations. x: [N, H, W, C4] int8 at the
    conv1 site scale; returns [N, H, W, C4] int8 at the next site scale."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, H, W, C4 = x.shape
    CM = pack["s1"].shape[-1]
    C4P = max(C4, 128)
    Wp = _cdiv(W + 2, 8) * 8
    if tb is None:
        per_img = ((H + 2) * Wp * C4P
                   + (H + 2) * (W + 2) * max(CM, 128) * 5   # h1 i8 + acc1 i32
                   + H * W * max(C4, 128) * 4)              # acc3 i32
        tb = _pick_tb(per_img, N)
    while N % tb:
        tb //= 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, C4P - C4)))
    kernel = functools.partial(_bottleneck_kernel, TB=tb, H=H, W=W,
                               C4=C4P, CM=CM, wide_k=wide_k,
                               flat_mask=flat_mask)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(N // tb,),
        in_specs=[
            pl.BlockSpec((tb, H + 2, Wp, C4P), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((C4P, CM)), full((1, CM)), full((1, CM)),
            full((3, 3 * CM, CM)), full((1, CM)), full((1, CM)),
            full((CM, C4)), full((1, C4)), full((1, C4)),
        ],
        out_specs=pl.BlockSpec((tb, H, W, C4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C4), jnp.int8),
        scratch_shapes=[pltpu.VMEM((tb, H + 2, W + 2, CM), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * ((H + 2) * (W + 2) * C4P * CM
                           + H * W * 9 * CM * CM + H * W * CM * C4),
            bytes_accessed=N * (H + 2) * Wp * C4P + N * H * W * C4
            + C4P * CM + 9 * CM * CM + CM * C4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, pack["inv"], pack["w1"], pack["s1"], pack["b1"],
      pack["w2"], pack["s2"], pack["b2"], pack["w3"], pack["s3"], pack["b3"])


# ---------------------------------------------------------------------------
# offline packing from the quantized flat store
# ---------------------------------------------------------------------------

def _site(qflat, act_scales, name):
    p = qflat[name]
    qw = p["qw"]
    w = jnp.asarray(qw.values, jnp.int8).reshape(qw.layout_shape)
    wscale = jnp.broadcast_to(jnp.asarray(qw.scale, jnp.float32),
                              (qw.layout_shape[-1],))
    comb = jnp.asarray(float(act_scales[name]), jnp.float32) * wscale
    b = p.get("b")
    b = (jnp.zeros((qw.layout_shape[-1],), jnp.float32) if b is None
         else jnp.asarray(b, jnp.float32))
    return w, comb.reshape(1, -1), b.reshape(1, -1)


def _regroup_kw(w, cp):
    """[3,3,C,OC] int8 -> [3, 3*CP, OC]: kh-major, K = (kw, channel) with the
    channel dim zero-padded to CP (matches the kernel's lane-concat of kw
    taps)."""
    C, OC = w.shape[2], w.shape[3]
    w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - C), (0, 0)))
    return w.reshape(3, 3 * cp, OC)


def pack_basic_block(qflat, act_scales, site: str, nxt: str) -> Dict[str, jnp.ndarray]:
    """Pack one identity BasicBlock (site.conv1/site.conv2) for the fused
    kernel. `nxt` is the junction consumer site (next block's conv1)."""
    w1, comb1, b1 = _site(qflat, act_scales, f"{site}.conv1")
    w2, comb2, b2 = _site(qflat, act_scales, f"{site}.conv2")
    C = w1.shape[2]
    CP = max(C, 128)
    s_in = float(act_scales[f"{site}.conv1"])
    s_mid = float(act_scales[f"{site}.conv2"])
    s_nxt = float(act_scales[nxt])
    inv = jnp.asarray([[1.0 / s_mid, 1.0 / s_nxt, s_in / s_nxt]], jnp.float32)
    return {
        "inv": inv,
        "w1": _regroup_kw(w1, CP), "s1": comb1, "b1": b1,
        "w2": _regroup_kw(w2, w1.shape[3]), "s2": comb2, "b2": b2,
    }


def pack_fused_blocks(qflat, act_scales, cfg) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Walk a ResNet config (models/resnet.ResNetConfig) and pack every
    identity (stride-1, no-downsample) residual block that has an int8
    junction consumer. Returns {site: pack}; sites not present are run on
    the XLA FullFusedCtx composition. Mirrors qforward_fused2's site/nxt
    naming exactly."""
    packs: Dict[str, Dict[str, jnp.ndarray]] = {}
    nb = cfg.blocks_per_stage
    for s in range(4):
        for b in range(nb[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            site = f"layer{s+1}.{b}"
            if b + 1 < nb[s]:
                nxt = f"layer{s+1}.{b+1}.conv1"
            elif s < 3:
                nxt = f"layer{s+2}.0.conv1"
            else:
                nxt = None   # final junction stays fp32 (see qforward_fused2)
            if stride != 1 or nxt is None or f"{site}.down" in qflat:
                continue
            if cfg.bottleneck:
                packs[site] = pack_bottleneck_block(qflat, act_scales, site, nxt)
            else:
                if qflat[f"{site}.conv1"]["qw"].layout_shape[2] < 128:
                    # Mosaic rejects 64-lane int8 interchange ("shape cast",
                    # tools/probe_block_variants.py); internal 128-padding
                    # would 4x the compute — layer1-class blocks stay on XLA
                    continue
                packs[site] = pack_basic_block(qflat, act_scales, site, nxt)
    return packs


def pack_bottleneck_block(qflat, act_scales, site: str, nxt: str
                          ) -> Dict[str, jnp.ndarray]:
    """Pack one identity Bottleneck (site.conv1/2/3) for the fused kernel."""
    w1, comb1, b1 = _site(qflat, act_scales, f"{site}.conv1")   # [1,1,C4,CM]
    w2, comb2, b2 = _site(qflat, act_scales, f"{site}.conv2")   # [3,3,CM,CM]
    w3, comb3, b3 = _site(qflat, act_scales, f"{site}.conv3")   # [1,1,CM,C4]
    C4, CM = w1.shape[2], w1.shape[3]
    C4P = max(C4, 128)
    # Mosaic rejects 64-lane int8 interchange; pad the mid width to >=128
    # with zero weight columns + zero scales/bias (zeros self-propagate
    # through relu/requant and the padded w3 rows contribute nothing)
    CMP = max(CM, 128)
    padc = lambda v: jnp.pad(v, ((0, 0), (0, CMP - CM)))
    w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, 0), (0, CMP - CM)))
    s_in = float(act_scales[f"{site}.conv1"])
    inv = jnp.asarray([[1.0 / float(act_scales[f"{site}.conv2"]),
                        1.0 / float(act_scales[f"{site}.conv3"]),
                        1.0 / float(act_scales[nxt]),
                        s_in / float(act_scales[nxt])]], jnp.float32)
    return {
        "inv": inv,
        "w1": jnp.pad(w1.reshape(C4, CM), ((0, C4P - C4), (0, CMP - CM))),
        "s1": padc(comb1), "b1": padc(b1),
        "w2": _regroup_kw(w2p, CMP), "s2": padc(comb2), "b2": padc(b2),
        "w3": jnp.pad(w3.reshape(CM, C4), ((0, CMP - CM), (0, 0))),
        "s3": comb3, "b3": b3,
    }
