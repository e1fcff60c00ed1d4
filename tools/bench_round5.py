#!/usr/bin/env python
"""Round-5 campaign (one process per TPU phase, phases selectable):

  info        backend/libtpu banner (decides whether the parked Mosaic
              retries are worth re-running).
  attn        the int8-attention A/B at b384 DeiT-Ti (VERDICT r3 #2):
              fully-fused W8A8 block (bf16 in-kernel attention, per-layer
              and 6-stacked) vs the split-attention block calling out to
              XLA for attention — bf16 control arm (isolates the split
              cost) and the dynamically-quantized int8 arm (the
              Mosaic-independent int8 MXU rate). Cosine gates vs the fp32
              oracle on every variant.
  tiles       per-shape tile/impl autotune campaign (VERDICT r3 #5):
              ops/tile_autotune at the roofline anchor (4096^3), the
              small-M ViT-ish shapes (256/1024 x 4096^2), and a ResNet
              late-stage 1x1 shape; prints every candidate's ms and
              persists winners (also mergeable into the shipped table
              with --write-table).
  serving_lat CPU-clock serving latency study (VERDICT r3 #4): p50/p99
              through the continuous batcher at 3 load points, plus the
              overload='reject' path under saturation. Run with
              DLQ_PLATFORM=cpu (wall latency through the TPU relay is
              meaningless — 1.8 s RTT).

Usage:  python tools/bench_round5.py [info attn tiles serving_lat] [--write-table]
Writes one JSON line per measurement to stdout AND runlogs/r5/round5.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_LOG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runlogs", "r5", "round5.jsonl")


def _emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    os.makedirs(os.path.dirname(_LOG), exist_ok=True)
    with open(_LOG, "a") as f:
        f.write(line + "\n")


def phase_info():
    import jax
    import jaxlib

    ver = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    try:
        import importlib.metadata as md

        for d in ("libtpu", "libtpu-nightly"):
            try:
                ver["libtpu"] = md.version(d)
                break
            except md.PackageNotFoundError:
                pass
    except Exception:
        pass
    _emit(phase="info", device=str(jax.devices()[0]),
          n_devices=len(jax.devices()), **ver)


def _build_w8_deit(batch):
    """DeiT-Ti 224px W8A8: quantize + pack once; return everything the
    variants need."""
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
        vit_forward,
    )
    from dlq_tpu.ops.pallas_vit_block import pack_vit_blocks_w8
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg = ViTConfig()  # DeiT-Ti: 224px, dim 192, depth 12, heads 3
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (16, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(qflat, scales, ex, cfg, tight=True)
    x = rng.normal(0, 1, (batch, 224, 224, 3)).astype(np.float32)
    gate_x = jnp.asarray(x[:64])
    fp32 = np.asarray(jax.jit(lambda xx: vit_forward(
        params, xx, __import__("dataclasses").replace(cfg, gelu="tanh")))(gate_x))
    return cfg, packed, x, gate_x, fp32


def phase_attn(batch=384, iters=8):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.ops.pallas_vit_block import (
        stack_vit_blocks_w8, vit_forward_blockfused_w8,
        vit_forward_blockfused_w8_split, vit_forward_multiblock_w8,
    )
    from dlq_tpu.timing import device_time_fn

    if os.environ.get("DLQ_R5_SMOKE") == "1":
        batch, iters = 8, 2
    cfg, packed, x, gate_x, fp32 = _build_w8_deit(batch)
    stacked = dict(packed)
    lpk = 6 if cfg.depth % 6 == 0 else 1
    stacked["_chunks"] = stack_vit_blocks_w8(packed, lpk)
    stacked.pop("blocks")

    variants = {
        "fused_per_layer_bt4":
            lambda p, xx: vit_forward_blockfused_w8(p, xx, cfg, bt=4, tight=True),
        f"fused_stacked_L{lpk}_bt4":
            lambda p, xx: vit_forward_multiblock_w8(p, xx, cfg, bt=4, tight=True),
        "split_bf16_bt8":
            lambda p, xx: vit_forward_blockfused_w8_split(
                p, xx, cfg, bt=8, tight=True, attn="bf16"),
        "split_int8_bt8":
            lambda p, xx: vit_forward_blockfused_w8_split(
                p, xx, cfg, bt=8, tight=True, attn="int8"),
        "split_int8_bt4":
            lambda p, xx: vit_forward_blockfused_w8_split(
                p, xx, cfg, bt=4, tight=True, attn="int8"),
    }
    for name, fn in variants.items():
        payload = stacked if "stacked" in name else packed
        try:
            out = np.asarray(jax.jit(fn)(payload, gate_x))
            cos = numerics.diff(out, fp32).cosine
            agree = numerics.top1_agreement(out, fp32)
            r = device_time_fn(fn, payload, jnp.asarray(x), perturb_arg=1,
                               n_small=2, n_big=2 + iters)
            ips = batch / (r["ms_median"] / 1e3)
            _emit(phase="attn", variant=name, batch=batch,
                  ms=round(r["ms_median"], 3), img_s=round(ips, 1),
                  cosine_vs_fp32=round(float(cos), 6),
                  top1_agree_vs_fp32=float(agree))
        except Exception as e:
            _emit(phase="attn", variant=name, batch=batch,
                  error=f"{type(e).__name__}: {str(e)[:300]}")


def phase_tiles(write_table=False, iters=8):
    from dlq_tpu.ops import tile_autotune as TA

    smoke = os.environ.get("DLQ_R5_SMOKE") == "1"
    if smoke:
        int8_shapes = [(256, 256, 256)]
        w4_shapes = [(256, 256, 256)]
        w4a8_shapes = [(256, 256, 256)]
        iters = 2
    else:
        int8_shapes = [(4096, 4096, 4096), (256, 4096, 4096),
                       (1024, 4096, 4096), (25088, 512, 512)]
        w4_shapes = [(256, 4096, 4096), (1024, 4096, 4096),
                     (4096, 4096, 4096)]
        w4a8_shapes = [(1024, 4096, 4096), (4096, 4096, 4096)]
    for M, K, N in int8_shapes:
        e = TA.autotune_int8(M, K, N, iters=iters)
        _emit(phase="tiles", kind="w8a8", M=M, K=K, N=N, **{
            k: v for k, v in e.items() if k != "tried"}, tried=e["tried"])
    for M, K, N in w4_shapes:
        e = TA.autotune_w4a16(M, K, N, iters=iters)
        _emit(phase="tiles", kind="w4a16", M=M, K=K, N=N, **{
            k: v for k, v in e.items() if k != "tried"}, tried=e["tried"])
    for M, K, N in w4a8_shapes:
        e = TA.autotune_w4a8(M, K, N, iters=iters)
        _emit(phase="tiles", kind="w4a8", M=M, K=K, N=N, **{
            k: v for k, v in e.items() if k != "tried"}, tried=e["tried"])
    if write_table:
        # merge the measured local cache into the committed shipped table
        local = TA._load(TA.cache_path())
        table = TA._load(TA.TABLE_PATH)
        table.update(local)
        with open(TA.TABLE_PATH, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
        _emit(phase="tiles", wrote_table=TA.TABLE_PATH, entries=len(table))


def phase_serving_lat():
    """CPU serving latency percentiles at 3 load points + overload reject."""
    import jax

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.mlp import MLPConfig, init_mlp, mlp_forward
    from dlq_tpu.serving import InferenceServer, ServerOverloaded

    cfg = MLPConfig()
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def one_point(clients, per_client, batch=64, max_wait_ms=2.0,
                  overload="wait", max_queue=4096):
        eng = Engine.fp32(mlp_forward, params, cfg, batch=batch)
        eng.warmup((784,))  # steady-state latency: keep the jit compile
        srv = InferenceServer(eng, max_wait_ms=max_wait_ms,  # out of p99
                              max_queue=max_queue, overload=overload).start()
        xs = rng.normal(0, 1, (clients, per_client, 784)).astype(np.float32)
        rejected = [0] * clients

        def worker(i):
            for j in range(per_client):
                try:
                    srv.infer(xs[i, j], timeout=120)
                except ServerOverloaded:
                    rejected[i] += 1
                    time.sleep(0.002)

        t0 = time.perf_counter()
        ths = [threading.Thread(target=worker, args=(i,)) for i in range(clients)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        wall = time.perf_counter() - t0
        lat = srv.latency_stats()
        srv.stop()
        done = clients * per_client - sum(rejected)
        _emit(phase="serving_lat", clients=clients, per_client=per_client,
              batch=batch, overload=overload, max_queue=max_queue,
              completed=done, rejected=sum(rejected),
              throughput_req_s=round(done / wall, 1),
              qdepth_max=int(srv.stats["qdepth_max"]),
              mean_fill=round(srv.mean_fill, 3),
              **{k: round(v, 2) for k, v in lat.items()})

    one_point(clients=4, per_client=40)       # low load: latency floor
    one_point(clients=32, per_client=20)      # medium: batches fill
    one_point(clients=128, per_client=10)     # high: saturation
    one_point(clients=128, per_client=10,     # overload: bounded queue,
              overload="reject", max_queue=64)  # reject-not-collapse


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_table = "--write-table" in sys.argv
    phases = args or ["info"]
    for ph in phases:
        if ph == "info":
            phase_info()
        elif ph == "attn":
            phase_attn()
        elif ph == "tiles":
            phase_tiles(write_table=write_table)
        elif ph == "serving_lat":
            phase_serving_lat()
        else:
            raise SystemExit(f"unknown phase {ph}")


if __name__ == "__main__":
    main()
