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


# ---------------------------------------------------------------------------
# work model: u32-multiply counts for the v2 (limb-major Straus) kernels.
# "Speed of light" reference: the measured peak of the limb-major mont_mul
# kernel itself is ~34 G u32-mults/s on v5e (in-scan, 256k lanes); the VPU
# issue-rate bound is ~1 T/s, so kernel-level MFU is reported against BOTH.
# ---------------------------------------------------------------------------

VPU_PEAK_U32_MULTS = 1.0e12  # v5e vector-unit u32-multiply issue bound (approx)
MEASURED_PEAK_U32_MULTS = 34.0e9  # best observed mont_mul kernel rate (r4)


def mont_mul_work(n_limbs: int) -> int:
    """u32 multiplies per Montgomery multiplication: full 2n-column pass
    plus two constant passes (~n^2/2 + n^2) => ~2.5 n^2."""
    return (5 * n_limbs * n_limbs) // 2


def straus_msm_work(
    num_lanes: int,
    n_limbs: int,
    nbits: int = 255,
    window_bits: int = 4,
    fp2: bool = False,
    tail: int = 256,
) -> int:
    """u32 multiplies for one gather-free Straus MSM (msm.straus).

    adds = B*(2^c - 2) table + W*(B + tail/2*log2(tail) - tail) window
    reductions; each complete add costs ~14 base-field muls (12 RCB muls +
    small-constant chains), tripled for Fp2 coordinates."""
    W = (nbits + window_bits - 1) // window_bits
    t = min(tail, num_lanes)
    import math

    reduce_adds = num_lanes - t + (t // 2) * max(1, int(math.log2(t)))
    adds = num_lanes * ((1 << window_bits) - 2) + W * reduce_adds
    muls_per_add = 14 * (3 if fp2 else 1)
    return adds * muls_per_add * mont_mul_work(n_limbs)


def throughput_line(metric: str, work_u32_mults: int, seconds: float) -> str:
    rate = work_u32_mults / max(seconds, 1e-9)
    return json.dumps(
        {
            "metric": metric,
            "u32_mults": work_u32_mults,
            "seconds": round(seconds, 4),
            "u32_mults_per_sec": round(rate),
            "mfu_vs_vpu_peak": round(rate / VPU_PEAK_U32_MULTS, 4),
            "mfu_vs_kernel_peak": round(rate / MEASURED_PEAK_U32_MULTS, 4),
        }
    )
