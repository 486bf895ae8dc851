"""Multi-scalar multiplication over device point batches.

TPU-native replacement for ark-ec's variable-base Pippenger MSM (SURVEY.md
section 2.2 row 2) — the Groth16/KZG hot loop.

v1 strategy (correctness-first, fully batched; see SURVEY.md section 7.3
item 3 for the planned sort-based Pippenger):
  * scalars are classified on host: zeros are dropped, 0/1 scalars go
    through a single masked Jacobian tree reduction (`sw_msm_bool` — the
    dominant class in Pedersen-circuit witnesses), and general scalars take
    the batched double-and-add path (`sw_scalar_mul` + tree reduce).
  * batch sizes are padded to powers of two so XLA compiles one kernel per
    size class instead of one per circuit.

Points live on device as affine Montgomery limb planes; results return as
host affine points for the (host-side, O(1)) verifier and serialization.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv
from zkmember_tpu.curves import device as cdv


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


# Minimum device batch: collapses small-size classes into one compiled
# kernel shape (padding is cheap on TPU; recompiles are not).  Kept small by
# default so the CPU test suite doesn't pay 4x padded compute on toy MSMs.
import os as _os

MIN_BATCH = int(_os.environ.get("ZKMEMBER_MIN_BATCH", "16"))


def _pad_size(x: int) -> int:
    return max(MIN_BATCH, _next_pow2(max(x, 1)))


class PointArray:
    """A device-resident array of affine points with host mirrors.

    Generic over base field: Fp (coords are (B, n) arrays) or Fp2 (coords are
    pairs of (B, n) arrays).  `curve` is the host curve (for host fallbacks).
    """

    def __init__(self, F, curve, coords_x, coords_y, host_points=None):
        self.F = F
        self.curve = curve
        self.x = coords_x
        self.y = coords_y
        self.host_points = host_points

    def __len__(self):
        c = self.x
        while isinstance(c, tuple):
            c = c[0]
        return c.shape[0]

    def take(self, idx: np.ndarray) -> "PointArray":
        def tk(c):
            if isinstance(c, tuple):
                return tuple(tk(ci) for ci in c)
            return jnp.take(c, jnp.asarray(idx), axis=0)

        return PointArray(self.F, self.curve, tk(self.x), tk(self.y))

    def pad_to(self, m: int) -> "PointArray":
        b = len(self)
        if b == m:
            return self

        def pd(c):
            if isinstance(c, tuple):
                return tuple(pd(ci) for ci in c)
            return jnp.pad(c, [(0, m - b)] + [(0, 0)] * (c.ndim - 1))

        return PointArray(self.F, self.curve, pd(self.x), pd(self.y))

    def jacobian(self, z_mask=None):
        """(X, Y, Z) with Z = 1 (or 0 where mask says infinity)."""
        B = (len(self),)
        Z = self.F.ones(B)
        return (self.x, self.y, Z)


def g1_points_from_host(spec: dv.FieldSpec, curve, pts) -> PointArray:
    """Host affine points (no infinities) -> device PointArray."""
    xs = spec.to_mont_host([p[0].v for p in pts])
    ys = spec.to_mont_host([p[1].v for p in pts])
    return PointArray(dv.FpOps(spec), curve, jnp.asarray(xs), jnp.asarray(ys), pts)


def g2_points_from_host(spec2: dv.Fp2Spec, curve, pts) -> PointArray:
    base = spec2.base

    def comp(i, j):
        return jnp.asarray(base.to_mont_host([p[i].coeffs[j].v for p in pts]))

    X = (comp(0, 0), comp(0, 1))
    Y = (comp(1, 0), comp(1, 1))
    return PointArray(dv.Fp2Ops(spec2), curve, X, Y, pts)


# aliases used by snark.groth16
G1Points = g1_points_from_host
G2Points = g2_points_from_host


def scalars_to_bits_np(scalars, nbits: int) -> np.ndarray:
    out = np.zeros((len(scalars), nbits), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s)
        for j in range(nbits):
            out[i, j] = (s >> (nbits - 1 - j)) & 1
    return out


WINDOW_BITS = 4


def u64_rows_to_digits(rows: np.ndarray, nbits: int) -> np.ndarray:
    """(B, nl) little-endian u64 scalar rows -> (B, nwin) 4-bit window
    digits, most-significant window first (vectorized nibble split; the
    per-scalar Python loop was a prove-path hotspot at domain sizes)."""
    rows = np.ascontiguousarray(rows, "<u8")
    b8 = rows.view(np.uint8)  # (B, nl*8) LE bytes
    nib = np.empty((rows.shape[0], b8.shape[1] * 2), np.uint8)
    nib[:, 0::2] = b8 & 0xF
    nib[:, 1::2] = b8 >> 4
    nwin = (nbits + WINDOW_BITS - 1) // WINDOW_BITS
    assert nwin <= nib.shape[1]
    return nib[:, nwin - 1 :: -1].astype(np.uint32)  # MSW first


def scalars_to_digits_np(scalars, nbits: int, c: int = WINDOW_BITS) -> np.ndarray:
    """(B, ceil(nbits/c)) window digits, most-significant window first."""
    assert c == WINDOW_BITS
    nwin = (nbits + c - 1) // c
    nl = (nwin * c + 63) // 64
    from zkmember_tpu import native as zknative

    return u64_rows_to_digits(zknative.ints_to_u64(scalars, nl), nbits)


@partial(jax.jit, static_argnums=(0,))
def _msm_general_kernel(F, digits, X, Y):
    P = (X, Y, F.ones((_leading(X),)))
    per_point = cdv.sw_scalar_mul_windowed(F, digits, P, WINDOW_BITS)
    return cdv.sw_tree_reduce(F, per_point)


@partial(jax.jit, static_argnums=(0,))
def _msm_bool_kernel(F, mask, X, Y):
    P = (X, Y, F.ones((_leading(X),)))
    return cdv.sw_msm_bool(F, mask, P)


def _leading(c):
    while isinstance(c, tuple):
        c = c[0]
    return c.shape[0]


def _jac_to_host(F, spec_or_none, curve, J):
    """Single Jacobian device point -> host affine point (or None)."""
    Jb = tuple(_expand0(c) for c in J)
    x, y, inf = cdv.sw_to_affine(F, Jb)
    if bool(np.asarray(inf)[0]):
        return None
    if isinstance(x, tuple):  # Fp2
        base = F.spec.base
        x0, x1 = (base.from_mont_host(np.asarray(c))[0] for c in x)
        y0, y1 = (base.from_mont_host(np.asarray(c))[0] for c in y)
        f2 = curve.field
        fq = f2.base
        return (f2(fq(x0), fq(x1)), f2(fq(y0), fq(y1)))
    spec = F.spec
    xv = spec.from_mont_host(np.asarray(x))[0]
    yv = spec.from_mont_host(np.asarray(y))[0]
    return (curve.field(xv), curve.field(yv))


def _expand0(c):
    if isinstance(c, tuple):
        return tuple(_expand0(ci) for ci in c)
    return c[None]


def msm(points: PointArray, scalars, order: int, nbits: int | None = None):
    """sum_i scalars[i] * points[i] -> host affine point (or None).

    scalars: python ints (mod `order`) OR a (B, nl) little-endian u64
    canonical-scalar numpy array (the prover's native path).  Classification
    (vectorized): zeros dropped, {0,1} handled by the masked tree reduction,
    the rest by batched windowed mul.  Partials combine on host (2 points).
    """
    if nbits is None:
        nbits = order.bit_length()
    nl = (nbits + 63) // 64
    if isinstance(scalars, np.ndarray) and scalars.dtype == np.uint64:
        rows = np.ascontiguousarray(scalars, "<u8")
    else:
        from zkmember_tpu import native as zknative

        rows = zknative.ints_to_u64([int(s) % order for s in scalars], nl)
    assert rows.shape[0] == len(points)

    is_zero = ~rows.any(axis=1)
    is_one = (rows[:, 0] == 1) & ~rows[:, 1:].any(axis=1)
    ones_idx = np.nonzero(is_one)[0]
    gen_idx = np.nonzero(~is_zero & ~is_one)[0]

    curve, F = points.curve, points.F
    total = None
    if ones_idx.size:
        m = _pad_size(len(ones_idx))
        sel = points.take(ones_idx.astype(np.int64)).pad_to(m)
        mask = np.zeros(m, np.uint32)
        mask[: len(ones_idx)] = 1
        J = _msm_bool_kernel(F, jnp.asarray(mask), sel.x, sel.y)
        total = _host_add(curve, total, _jac_to_host(F, None, curve, J))
    if gen_idx.size:
        m = _pad_size(len(gen_idx))
        sel = points.take(gen_idx.astype(np.int64)).pad_to(m)
        nwin = (nbits + WINDOW_BITS - 1) // WINDOW_BITS
        digits = np.zeros((m, nwin), np.uint32)
        digits[: len(gen_idx)] = u64_rows_to_digits(rows[gen_idx], nbits)
        J = _msm_general_kernel(F, jnp.asarray(digits), sel.x, sel.y)
        total = _host_add(curve, total, _jac_to_host(F, None, curve, J))
    return total


def _host_add(curve, a, b):
    if a is None:
        return b
    if b is None:
        return a
    return curve.add(a, b)
