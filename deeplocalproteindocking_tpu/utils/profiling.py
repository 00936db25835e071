"""Profiling hooks (SURVEY.md §5.1).

The reference has only ad-hoc timing prints; here the sweep and train
loops can be wrapped in ``jax.profiler.trace`` (TensorBoard/Perfetto
viewable) via a CLI ``--profile`` flag, and every pipeline stage carries
a ``jax.named_scope`` so traces segment by stage.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """Wrap a region in a profiler trace when ``trace_dir`` is set."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StageTimer:
    """Host-side wall-clock timing of pipeline stages (blocks on device)."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, *sync_arrays):
        t0 = time.perf_counter()
        yield
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.times[name] = self.times.get(name, 0.0) + (
            time.perf_counter() - t0)
