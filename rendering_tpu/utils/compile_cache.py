"""Persistent XLA compilation cache.

The reference pays zero compile time (ahead-of-time C++); our jitted
pipelines pay a one-time XLA compile per (scene-shape, pass) — tens of
seconds on TPU. JAX's persistent compilation cache makes that a
ONE-TIME cost across processes: repeat CLI renders, benchmarks and
animations of the same scene shapes reuse the serialized executable
from disk instead of recompiling.

Opt-out with RT_NO_COMPILE_CACHE=1; override the location with
RT_COMPILE_CACHE_DIR. Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache; returns the
    directory (or None when disabled/unavailable)."""
    if os.environ.get("RT_NO_COMPILE_CACHE"):
        return None
    path = os.environ.get(
        "RT_COMPILE_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "rendering_tpu_xla"
        ),
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Cache every compile that matters (the 0.5 s floor skips
        # trivial sub-half-second programs on purpose — they recompile
        # faster than a cache probe over the tunnel) and never explode
        # on entry size: both knobs exist on current jax; tolerate
        # their absence on older versions.
        for k, v in (
            ("jax_persistent_cache_min_compile_time_secs", 0.5),
            ("jax_persistent_cache_min_entry_size_bytes", 0),
        ):
            try:
                jax.config.update(k, v)
            except Exception:
                pass
        return path
    except Exception:
        return None
