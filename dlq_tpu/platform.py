"""Backend selection helper.

This image's sitecustomize force-selects the tunneled TPU backend via
jax.config (ignoring JAX_PLATFORMS). ``apply_platform_env()`` lets tools and
tests opt out: set DLQ_PLATFORM=cpu (optionally DLQ_CPU_DEVICES=N for a
virtual mesh) before any backend initialization.
"""

from __future__ import annotations

import os

# single default for BOTH entry points (apply_platform_env and a direct
# enable_compile_cache call) — two defaults would fragment the persistent
# cache across directories (ADVICE r3)
DEFAULT_COMPILE_CACHE = "~/.cache/dlq_xla"


def apply_platform_env() -> None:
    plat = os.environ.get("DLQ_PLATFORM")
    # persistent compile cache is ON by default (round-4 probe: bench.py
    # cold-start 303 -> 201 s wall on the warm cache; a 6-model sweep in
    # 13 min). DLQ_COMPILE_CACHE=<dir> overrides the location; =0/off
    # disables (e.g. when bisecting compiler behavior).
    cache = os.environ.get("DLQ_COMPILE_CACHE", DEFAULT_COMPILE_CACHE)
    if cache.lower() not in ("0", "off", "false", "no", ""):
        # CPU runs get their own subdirectory: XLA:CPU AOT entries are
        # host-feature-specific, and a cache populated on another machine
        # spams loader errors (worst case SIGILL) when shared. The TPU
        # cache path is UNCHANGED (entries are device-keyed and warm —
        # do not orphan them).
        if plat == "cpu" and cache.lower() not in ("1", "true"):
            cache = os.path.join(cache, "cpu")
        elif plat == "cpu":
            cache = os.path.join(DEFAULT_COMPILE_CACHE, "cpu")
        enable_compile_cache(cache)
    if not plat:
        return
    import jax

    n = os.environ.get("DLQ_CPU_DEVICES")
    if n and plat == "cpu":
        jax.config.update("jax_num_cpu_devices", int(n))
    jax.config.update("jax_platforms", plat)


def enable_compile_cache(path: str = DEFAULT_COMPILE_CACHE) -> bool:
    """Persistent XLA compilation cache: executables cached on disk keyed by
    HLO, so a SECOND process jitting the same engine skips the multi-minute
    TPU compile (deployment cold-start + this environment's relay warmup).
    Set DLQ_COMPILE_CACHE=<dir> (or call this) before the first jit.
    Returns False if this jax/backend combination can't persist (harmless).
    """
    try:
        import jax

        p = os.path.expanduser(path if isinstance(path, str) and path not in ("1", "true") else DEFAULT_COMPILE_CACHE)
        os.makedirs(p, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception:
        return False
