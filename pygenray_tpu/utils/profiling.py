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
    def phase(self, name: str, sync: bool = True):
        """Time a phase, yielding a sync callable for async device results.

        The yielded object collects values produced INSIDE the block and
        blocks on them before the clock stops (a ``sync=arrays`` argument
        bound at entry could never see them)::

            with timer.phase("trace") as done:
                res = trace(...)
                done(res.ts)      # device work charged to this phase

        With ``sync=True`` (default) ``__exit__`` also drains all pending
        device work via ``jax.effects_barrier`` so un-registered async
        results are not silently charged to a later phase.
        """
        import jax

        pending = []

        def register(*arrays):
            pending.extend(arrays)
            return arrays[-1] if len(arrays) == 1 else arrays

        t0 = time.perf_counter()
        try:
            yield register
        finally:
            if pending:
                jax.block_until_ready(pending)
            elif sync:
                jax.effects_barrier()
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
