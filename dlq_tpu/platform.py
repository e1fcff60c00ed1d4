"""Backend selection helper.

This image's sitecustomize force-selects the tunneled TPU backend via
jax.config (ignoring JAX_PLATFORMS). ``apply_platform_env()`` lets tools and
tests opt out: set DLQ_PLATFORM=cpu (optionally DLQ_CPU_DEVICES=N for a
virtual mesh) before any backend initialization.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("DLQ_PLATFORM")
    if not plat:
        return
    import jax

    n = os.environ.get("DLQ_CPU_DEVICES")
    if n and plat == "cpu":
        jax.config.update("jax_num_cpu_devices", int(n))
    jax.config.update("jax_platforms", plat)
