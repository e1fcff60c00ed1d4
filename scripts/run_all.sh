#!/usr/bin/env bash
# Build + validate everything CPU-side (the reference's scripts/ orchestration
# role: build, auto-generate fixtures, run, log — SURVEY §2.4).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -C native

echo "== tests =="
DLQ_PLATFORM=cpu python -m pytest tests/ -q

echo "== tool ladder (export -> fixtures -> parity -> quantize -> bench) =="
D=$(mktemp -d)
export DLQ_PLATFORM=cpu
python tools/export_weights.py --model resnet18 --out "$D/r18" --num_classes 10 --small_input
python tools/make_fixtures.py --manifest "$D/r18"
python tools/run_parity.py --manifest "$D/r18"
python tools/quantize_model.py --manifest "$D/r18" --out "$D/r18_int8" --scheme int8_pc --batch 4 --calib_batches 2
python tools/bench_e2e.py --manifest "$D/r18" --qmanifest "$D/r18_int8" --synthetic 64 --batch 16 --iters 3 --runlog "$D/logs"
python tools/run_ladder.py --n 512 --epochs 1 --runlog "$D/logs"
echo "== all green; artifacts in $D =="
