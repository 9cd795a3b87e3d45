"""Profiling and timing helpers.

The reference has no tracing/profiling beyond tqdm progress bars (SURVEY
§5.1); on TPU the right tools are ``jax.profiler`` traces (viewable in
TensorBoard/XProf/Perfetto) and simple synchronized wall-clock phases.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["device_trace", "Timer", "timed"]


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace for the enclosed block.

    Example::

        with device_trace("/tmp/trace"):
            fan = pr.shoot_rays(...)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating named phase timer with device synchronization."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase; pass ``sync=arrays`` to block on device results."""
        import jax

        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k:>24s}: {v * 1e3:9.2f} ms ({v / total * 100:5.1f}%)" for k, v in self.phases.items()]
        lines.append(f"{'total':>24s}: {total * 1e3:9.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def timed(label: str, result_holder: dict = None):
    """Simple wall-clock context; stores seconds under ``label``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if result_holder is not None:
            result_holder[label] = dt
