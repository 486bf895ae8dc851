"""Observability: phase timers + kernel roofline accounting.

Replaces the reference's println-based timing and Criterion reports
(SURVEY.md section 5.5) with structured records, and adds what the
reference never had: per-kernel work estimates against the device roofline
(BASELINE.json north star: points/sec/chip with speed-of-light ratios).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field


@dataclass
class PhaseRecord:
    name: str
    seconds: float
    meta: dict = field(default_factory=dict)


class Profiler:
    """Collects named phase timings; nestable via context manager."""

    def __init__(self, emit=None):
        self.records: list[PhaseRecord] = []
        self._emit = emit

    @contextlib.contextmanager
    def phase(self, name: str, **meta):
        t0 = time.time()
        try:
            yield
        finally:
            rec = PhaseRecord(name, time.time() - t0, meta)
            self.records.append(rec)
            if self._emit:
                self._emit(json.dumps({"phase": rec.name, "s": round(rec.seconds, 4), **meta}))

    def summary(self) -> dict:
        out: dict = {}
        for r in self.records:
            out[r.name] = out.get(r.name, 0.0) + r.seconds
        return out

    def dump(self, stream=sys.stderr):
        for name, secs in sorted(self.summary().items(), key=lambda kv: -kv[1]):
            print(f"  {name:<28} {secs:8.3f}s", file=stream)


# work model: u32-multiply counts for the core kernels (per element)
def mont_mul_work(n_limbs: int) -> int:
    """Approx. u32 multiplies per Montgomery multiplication (3 half/full
    schoolbook passes of n^2 products)."""
    return 3 * n_limbs * n_limbs


def msm_work(num_points: int, n_limbs: int, window_bits: int = 4, nbits: int = 255) -> int:
    """u32 multiplies for the windowed batched MSM path."""
    muls_per_add = 16 + 8  # Jacobian add + the amortized doubling share
    point_ops = (1 << window_bits) - 2 + nbits + nbits // window_bits
    return num_points * point_ops * muls_per_add * mont_mul_work(n_limbs)


def throughput_line(metric: str, work_u32_mults: int, seconds: float) -> str:
    return json.dumps(
        {
            "metric": metric,
            "u32_mults": work_u32_mults,
            "seconds": round(seconds, 4),
            "u32_mults_per_sec": round(work_u32_mults / max(seconds, 1e-9)),
        }
    )
