"""Phase timing + device profiling (SURVEY.md §5).

The reference's observability is coarse wall-clock phase timing via
pytictoc (zonos_batch_cli.py:337-377) and a tqdm bar in the decode loop.
TPU-native equivalents:

- :class:`PhaseTimer` — named wall-clock phases with a printed summary
  (the pytictoc role, but reusable across CLIs and tests).
- :func:`device_trace` — context manager around ``jax.profiler`` producing
  an XPlane trace directory viewable in TensorBoard/XProf; used by CLI
  ``--profile`` flags and ``BENCH_PROFILE=1`` in bench.py.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("zonos_tpu.profiling")


class PhaseTimer:
    """Accumulates named wall-clock phases.

    >>> t = PhaseTimer()
    >>> with t.phase("load"): ...
    >>> with t.phase("generate"): ...
    >>> t.report()
    """

    def __init__(self, printer=print):
        self._printer = printer
        self.durations: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            self._printer(f"[t] {name}: {dt:.1f}s")

    def report(self) -> None:
        total = sum(self.durations.values())
        for name, dt in self.durations.items():
            self._printer(f"[t] {name:16s} {dt:8.2f}s  ({dt / total:5.1%})")
        self._printer(f"[t] {'total':16s} {total:8.2f}s")


@contextlib.contextmanager
def device_trace(out_dir: str | None):
    """Capture a jax.profiler trace to ``out_dir`` (no-op when None)."""
    if not out_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s (view with xprof/tensorboard)", out_dir)
