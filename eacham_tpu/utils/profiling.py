"""Device-level profiling hooks.

Complements the host-side BlockTimer (utils/timer.py — the reference's
only observability, modules/base/tools/BlockTimer.cpp) with the TPU-native
tool: `jax.profiler` traces viewable in TensorBoard/Perfetto, plus a
device-memory snapshot helper.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def device_trace(logdir: str = "/tmp/eacham_trace"):
    """Capture a device trace for everything inside the block.

    View with: tensorboard --logdir <logdir>  (or upload the .perfetto
    trace to ui.perfetto.dev).
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def memory_summary() -> str:
    """Per-device live-buffer summary (bytes in use)."""
    lines = []
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                used = stats.get("bytes_in_use", 0)
                limit = stats.get("bytes_limit", 0)
                lines.append(f"{d}: {used / 2**20:.1f} MiB"
                             + (f" / {limit / 2**20:.0f} MiB" if limit else ""))
                continue
        except Exception:
            pass
        lines.append(f"{d}: memory stats unavailable")
    return "\n".join(lines)
