"""Per-block throughput counters + profiler annotations.

``Metrics`` aggregates scheduler-level counters (blocks, raw/compressed
bytes, wall time per stage); ``trace_span`` annotates host stages into the
JAX profiler timeline when a trace is being captured (no-op otherwise).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict


@dataclasses.dataclass
class Metrics:
    blocks: int = 0
    raw_bytes: int = 0
    compressed_bytes: int = 0
    stage_seconds: dict = dataclasses.field(default_factory=lambda: defaultdict(float))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stage_seconds[name] += time.perf_counter() - t0

    def record_block(self, raw: int, compressed: int) -> None:
        self.blocks += 1
        self.raw_bytes += raw
        self.compressed_bytes += compressed

    @property
    def ratio(self) -> float:
        return self.raw_bytes / self.compressed_bytes if self.compressed_bytes else 0.0

    def throughput(self, stage: str) -> float:
        """Raw bytes per second through a stage (0 if not timed)."""
        s = self.stage_seconds.get(stage, 0.0)
        return self.raw_bytes / s if s else 0.0

    def summary(self) -> dict:
        return {
            "blocks": self.blocks,
            "raw_bytes": self.raw_bytes,
            "compressed_bytes": self.compressed_bytes,
            "ratio": round(self.ratio, 3),
            "stages_ms": {k: round(v * 1e3, 2) for k, v in self.stage_seconds.items()},
        }


@contextlib.contextmanager
def trace_span(name: str):
    """JAX profiler annotation (visible in captured traces); no-op cost when
    no trace is active. Exceptions raised by the body must propagate
    unchanged — only annotation *setup* failures fall back to a plain
    yield (a try around the yield itself would swallow body exceptions and
    double-yield)."""
    try:
        import jax.profiler

        annotation = jax.profiler.TraceAnnotation(name)
    except Exception:
        annotation = None
    if annotation is None:
        yield
    else:
        with annotation:
            yield
