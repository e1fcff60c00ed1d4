"""Benchmark harnesses: model throughput, kernel rooflines, scaling curves."""
