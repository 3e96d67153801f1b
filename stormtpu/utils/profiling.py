"""Profiling hooks (SURVEY.md §6 tracing row).

The reference embeds TSC cycle counters in its bench harness; the TPU
analog is a ``jax.profiler`` trace (TensorBoard/XProf format: per-kernel
device timelines, HBM traffic, fusion views) plus the honest wall-clock
harness in bench.py. ``trace()`` wraps any region; bench exposes it as
``python bench.py --profile /tmp/trace``.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

__all__ = ["trace"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the wrapped region to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
