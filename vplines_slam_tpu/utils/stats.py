"""Host-side stage timing + periodic statistics stream.

Parity with the reference's observability surface: the ubiquitous ``TicToc``
wall-clock timers (vins_estimator/src/utility/tic_toc.h, duplicated in 4
packages), the running solver/marginalization means kept on the estimator
(estimator.h:89-93), and the periodic ``printStatistics`` dump of extrinsic,
td, solver cost and total path length (utility/visualization.cpp:95-131).

Device work is asynchronously dispatched, so per-stage host timers measure
dispatch + any blocking transfer in that stage — the quantity that actually
bounds the host loop (see docs/PERF.md).  Pure device-side kernel times come
from the profiler scripts (examples/profile_track_step.py).
"""

from __future__ import annotations

import sys
import time
from typing import Optional


class TicToc:
    """Reference tic_toc.h parity: wall-clock ms since construction/tic."""

    def __init__(self):
        self.tic()

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


class StageTimers:
    """Named per-frame stage timers with running means."""

    def __init__(self):
        self.last: dict = {}
        self._sum: dict = {}
        self._n: dict = {}

    def time(self, name: str):
        timers = self

        class _Ctx:
            def __enter__(self):
                self._t = time.perf_counter()
                return self

            def __exit__(self, *exc):
                ms = (time.perf_counter() - self._t) * 1e3
                timers.last[name] = ms
                timers._sum[name] = timers._sum.get(name, 0.0) + ms
                timers._n[name] = timers._n.get(name, 0) + 1
                return False

        return _Ctx()

    def mean(self, name: str) -> float:
        n = self._n.get(name, 0)
        return self._sum.get(name, 0.0) / n if n else 0.0


class Statistics:
    """printStatistics-parity running summary (visualization.cpp:95-131)."""

    def __init__(self, print_every: int = 0, stream=None):
        self.print_every = print_every
        self.stream = stream if stream is not None else sys.stderr
        self.frames = 0
        self.keyframes = 0
        self.loops = 0
        self.path_length = 0.0
        self._last_p = None
        self.last_cost = float("nan")
        self._cost_sum = 0.0
        self._cost_n = 0
        self.timers = StageTimers()

    def update(self, p, is_keyframe: bool, loop_closed: bool, ba_cost=None):
        import numpy as np

        self.frames += 1
        if is_keyframe:
            self.keyframes += 1
        if loop_closed:
            self.loops += 1
        p = np.asarray(p, float)
        if self._last_p is not None:
            self.path_length += float(np.linalg.norm(p - self._last_p))
        self._last_p = p
        if ba_cost is not None:
            self.last_cost = float(ba_cost)
            self._cost_sum += self.last_cost
            self._cost_n += 1

    def summary(self, p_ic=None, q_ic=None, td: Optional[float] = None) -> str:
        import numpy as np

        t = self.timers
        stages = " ".join(
            f"{k}={t.mean(k):.1f}ms" for k in sorted(t._sum.keys())
        )
        parts = [
            f"frames={self.frames} kf={self.keyframes} loops={self.loops}",
            f"path={self.path_length:.2f}m",
        ]
        if self._cost_n:
            parts.append(
                f"cost last={self.last_cost:.3e} "
                f"mean={self._cost_sum / self._cost_n:.3e}"
            )
        if p_ic is not None:
            parts.append("p_ic=" + np.array2string(
                np.asarray(p_ic, float), precision=4, separator=","))
        if q_ic is not None:
            parts.append("q_ic=" + np.array2string(
                np.asarray(q_ic, float), precision=4, separator=","))
        if td is not None:
            parts.append(f"td={td * 1e3:.2f}ms")
        if stages:
            parts.append(stages)
        return "[vplines] " + "  ".join(parts)

    def maybe_print(self, p_ic=None, q_ic=None, td=None):
        if self.print_every and self.frames % self.print_every == 0:
            print(self.summary(p_ic=p_ic, q_ic=q_ic, td=td), file=self.stream)
