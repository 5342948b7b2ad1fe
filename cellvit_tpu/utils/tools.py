"""Small infra utilities: timers, profiling, dict tools.

Replaces the reference's `utils/tools.py` helpers (start_timer/end_timer,
get_size_of_dict, flatten/unflatten) and upgrades the tracing story
(SURVEY §5: the reference only has commented-out torch.profiler hooks) with
a `jax.profiler` context and per-stage wall-clock timers.
"""

from __future__ import annotations

import contextlib
import sys
import time
from pathlib import Path
from typing import Dict, Iterator, Optional


class Timer:
    """Wall-clock stage timer with named laps."""

    def __init__(self) -> None:
        self.laps: Dict[str, float] = {}
        self._starts: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._starts.pop(name)
        self.laps[name] = self.laps.get(name, 0.0) + dt
        return dt

    @contextlib.contextmanager
    def lap(self, name: str) -> Iterator[None]:
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def summary(self) -> Dict[str, float]:
        return dict(self.laps)


def start_timer() -> float:
    return time.perf_counter()


def end_timer(start: float, label: str = "") -> float:
    dt = time.perf_counter() - start
    if label:
        print(f"{label}: {dt:.2f}s")
    return dt


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof).

    No-op when log_dir is None — cheap enough to leave in pipelines.
    """
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def get_size_of_dict(d: Dict) -> int:
    """Rough recursive payload size in bytes (reference get_size_of_dict)."""
    size = sys.getsizeof(d)
    for k, v in d.items():
        size += sys.getsizeof(k)
        if isinstance(v, dict):
            size += get_size_of_dict(v)
        else:
            size += sys.getsizeof(v)
    return size


def close_logger(logger) -> None:
    for handler in list(logger.handlers):
        handler.close()
        logger.removeHandler(handler)


def cropping_center(x, crop_shape, batch: bool = False):
    """Center-crop an array to crop_shape (reference tools.py:38-59);
    works on numpy and jax arrays, HW[C] or BHW[C] with batch=True."""
    if not batch:
        h0 = int((x.shape[0] - crop_shape[0]) * 0.5)
        w0 = int((x.shape[1] - crop_shape[1]) * 0.5)
        return x[h0 : h0 + crop_shape[0], w0 : w0 + crop_shape[1], ...]
    h0 = int((x.shape[1] - crop_shape[0]) * 0.5)
    w0 = int((x.shape[2] - crop_shape[1]) * 0.5)
    return x[:, h0 : h0 + crop_shape[0], w0 : w0 + crop_shape[1], ...]
