"""Profiling — the TPU-level tracing subsystem (SURVEY §5.1).

The reference's only profiling is RAII wall-clock phase timers
(include/timer.h:8-40); utils.timer replicates those. This module is
the stated TPU equivalent: `jax.profiler` trace capture around a
render, giving XLA/Pallas op-level device timing (the only reliable
timing source over a remote-device tunnel, where host wall-clock
includes queueing noise).

Usage:
    with trace("/tmp/rt_trace"):
        render(scene)
    rows = op_profile(                      # needs the xprof package
        "/tmp/rt_trace")                    # -> [(op_name, time_ps), ...]

or from the CLI: `python -m rendering_tpu scene.scene --trace-dir DIR`.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a `jax.profiler` device trace into `logdir`.

    Wrap the traced region's final values in `jax.block_until_ready`
    inside the context (the CLI does) so async dispatch cannot leak
    device work past `stop_trace`.
    """
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def find_xplanes(logdir: str) -> list[str]:
    """The .xplane.pb capture files under a trace dir (newest run last)."""
    return sorted(
        glob.glob(
            os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
        ),
        key=os.path.getmtime,
    )


def op_profile(logdir: str, *, top: int = 20):
    """Per-op device-time table from the newest capture in `logdir`:
    [(op_display_name, raw_time_ps), ...] sorted descending, Pallas
    kernels included (they appear as `closed_call.N` custom-calls).
    Requires the `xprof` package (ships with the profiler plugin); a
    missing dependency raises ImportError with the pip hint."""
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError as e:  # pragma: no cover - env without xprof
        raise ImportError(
            "op_profile needs the `xprof` package "
            "(pip install xprof) — trace capture itself does not"
        ) from e

    planes = find_xplanes(logdir)
    if not planes:
        raise FileNotFoundError(f"no .xplane.pb captures under {logdir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [planes[-1]], "op_profile", {}
    )
    tree = json.loads(data)

    rows: list[tuple[str, float]] = []

    def walk(node):
        children = node.get("children", [])
        if not children:
            m = node.get("metrics") or {}
            t = float(m.get("rawTime", 0.0))
            if t > 0:
                rows.append((node.get("name", "?"), t))
        for c in children:
            walk(c)

    walk(tree.get("byProgramExcludeIdle", tree.get("byProgram", {})))
    rows.sort(key=lambda r: -r[1])
    return rows[:top]
