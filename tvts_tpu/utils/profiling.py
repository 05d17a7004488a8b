"""Timeline profiling + in-graph timing utilities.

The reference has no profiler at all (SURVEY §5 lists tracing/profiling as an
auxiliary subsystem the rebuild should provide); on TPU the right tools are
(a) XLA/XProf timeline traces (``trace`` / ``annotate``, loadable in
TensorBoard's profile plugin or xprof) and (b) result-fetching in-graph step
timers — on tunneled backends ``block_until_ready`` does NOT force execution,
so naive timers measure dispatch only (PERF.md).  ``StepTimer`` codifies the
repo's measurement discipline into a reusable object.

Known limitation, by design: over a remote-execution tunnel (the ``axon``
backend) device-side trace collection does not complete; ``trace`` degrades to
a warning + host-side trace so callers need no platform guard.  On a directly
attached TPU host it produces full device timelines.
"""

from __future__ import annotations

import contextlib
import glob
import os
import time


def annotate(name: str):
    """Named region marker that shows up on the XProf timeline
    (jax.profiler.TraceAnnotation). Usable as a context manager."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Collect an XProf/TensorBoard timeline trace into ``log_dir``.

    Wraps jax.profiler.trace but never raises on backends that cannot
    profile (e.g. the tunneled axon platform): the epoch loop must survive
    profiling being unavailable.
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    try:
        ctx = jax.profiler.trace(log_dir)
        ctx.__enter__()
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"profiling: trace unavailable on this backend ({e}); "
              "continuing without", flush=True)
        yield
        return
    try:
        yield
    finally:
        try:
            ctx.__exit__(None, None, None)
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"profiling: trace finalization failed ({e})", flush=True)


def trace_artifacts(log_dir: str) -> list[str]:
    """The .xplane.pb trace files under ``log_dir`` (what TensorBoard's
    profile plugin / xprof loads), newest run first."""
    pat = os.path.join(log_dir, "plugins", "profile", "*", "*.xplane.pb")
    return sorted(glob.glob(pat), key=os.path.getmtime, reverse=True)


class StepTimer:
    """Result-fetching step timer: per-step wall times with a warmup skip.

    Call ``timer.mark(aux)`` once per step with a device value from that step;
    fetching it (``float``) forces the step to completion before the clock
    reads, which a bare ``block_until_ready`` does not guarantee on
    tunneled backends (PERF.md round-1 gotcha).
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._count = 0
        self._last = None

    def mark(self, fetch=None) -> float | None:
        """Record a step boundary. ``fetch``: any device scalar from the
        just-dispatched step (its value is fetched to force execution).
        Returns the step's wall time in seconds (None during warmup)."""
        if fetch is not None:
            float(fetch)
        now = time.perf_counter()
        self._count += 1
        dt = None
        # interval i ends at mark i+1; skip the first `warmup` intervals
        if self._last is not None and self._count - 1 > self.warmup:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def times(self) -> list[float]:
        return list(self._times)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "min_s": ts[0],
            "max_s": ts[-1],
            "steps_per_s": n / sum(ts),
        }
