"""Profiling and timing harness (SURVEY.md §5: the reference has no tracing
or profiling at all — only a wall-clock ETA progress bar,
train/train_BoostedNeuralLDPCDecoder.py:21-69).

Three tools:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` that captures
    a TensorBoard/Perfetto trace of everything inside it (device kernels,
    host callbacks, transfers).
  * ``benchmark(fn, *args)`` — a ``block_until_ready`` timing loop with
    warmup-compile separation; reports compile time, steady-state latency,
    and derived throughput.
  * ``Timer`` — lightweight named section accumulator for host-side phases
    (datagen vs device step vs checkpoint), printable as a table.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device+host profiler trace into ``logdir`` (view with
    TensorBoard's profile plugin or ui.perfetto.dev)."""
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class BenchResult:
    compile_s: float
    mean_s: float
    best_s: float
    reps: int
    items_per_s: Optional[float] = None

    def __str__(self):
        s = (f"compile {self.compile_s * 1e3:.1f} ms | "
             f"mean {self.mean_s * 1e3:.3f} ms | best {self.best_s * 1e3:.3f} ms "
             f"({self.reps} reps)")
        if self.items_per_s is not None:
            s += f" | {self.items_per_s:,.0f} items/s"
        return s


def benchmark(
    fn: Callable,
    *args,
    reps: int = 20,
    warmup: int = 2,
    items_per_call: Optional[int] = None,
    **kwargs,
) -> BenchResult:
    """Time ``fn(*args)`` with dispatch+compile separated from steady state.

    ``fn`` may return any pytree of jax arrays; timing uses
    ``block_until_ready`` on the result, so async dispatch is measured
    correctly (the standard TPU timing pitfall).
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args, **kwargs))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    mean_s = sum(times) / len(times)
    best_s = min(times)
    return BenchResult(
        compile_s=compile_s,
        mean_s=mean_s,
        best_s=best_s,
        reps=reps,
        items_per_s=items_per_call / mean_s if items_per_call else None,
    )


class Timer:
    """Named host-side section accumulator.

    >>> t = Timer()
    >>> with t("datagen"): ...
    >>> with t("step"): ...
    >>> print(t.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"{'section':<24}{'total s':>10}{'calls':>8}{'mean ms':>10}{'share':>8}"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:<24}{t:>10.3f}{n:>8}{t / n * 1e3:>10.2f}{t / total:>8.1%}"
            )
        return "\n".join(lines)
