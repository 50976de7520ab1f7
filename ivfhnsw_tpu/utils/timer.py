"""Timing helpers (StopW equivalent, reference utils.h:35-50)."""

from __future__ import annotations

import time


class StopW:
    """Microsecond stopwatch with the same getElapsedTimeMicro/reset surface
    as the reference's StopW (utils.h:35-50)."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def getElapsedTimeMicro(self) -> float:
        return (time.perf_counter() - self._t0) * 1e6

    def elapsed_s(self) -> float:
        return time.perf_counter() - self._t0

    def reset(self) -> None:
        self._t0 = time.perf_counter()
