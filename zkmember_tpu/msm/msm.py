"""Multi-scalar multiplication over device point batches.

TPU-native replacement for ark-ec's variable-base Pippenger MSM (SURVEY.md
section 2.2 row 2) — the Groth16/KZG hot loop.

Compile-latency-first design (the axon TPU backend compiles remotely, so
every distinct jitted program costs tens of seconds of cold-start):
  * every kernel runs on a FIXED canonical tile shape (`tile()`); callers
    pad/chunk on the host, so the whole framework compiles ONE program per
    (kernel, field) pair regardless of circuit size;
  * kernels fuse their reduction: `_windowed_partial` / `_bool_partial` map
    a tile of points directly to a single Jacobian partial sum, and chunk
    partials are combined by `_finish` (fixed-width tree reduce + affine
    normalization) — results never round-trip through host bignums;
  * scalars are classified on host: zeros are dropped, 0/1 scalars go
    through the masked tree reduction (the dominant class in Pedersen
    -circuit witnesses), the rest take the batched windowed path.

Points live on device as affine Montgomery limb planes; results return as
host affine points for the (host-side, O(1)) verifier and serialization.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv
from zkmember_tpu.curves import device as cdv


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


_TILE: int | None = None


def tile() -> int:
    """Canonical point-batch tile: every MSM/fixed-base kernel compiles for
    exactly this leading dimension.  Resolved once, env-overridable; the CPU
    default is small so the 2-core test box doesn't pay padded compute."""
    global _TILE
    if _TILE is None:
        env = os.environ.get("ZKMEMBER_MSM_TILE")
        if env:
            _TILE = int(env)
        else:
            _TILE = 4096 if jax.default_backend() == "tpu" else 64
    return _TILE


COMBINE_WIDTH = 32  # fixed batch of the partial-combine/finish kernel


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


# ---------------------------------------------------------------------------
# tile kernels — one compiled program per (kernel, field) for any input size
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def _windowed_partial_kernel(F, digits, X, Y):
    """(tile, nwin) digits + affine tile -> ONE Jacobian partial sum."""
    P = (X, Y, F.ones((_leading(X),)))
    per_point = cdv.sw_scalar_mul_windowed(F, digits, P, WINDOW_BITS)
    return cdv.sw_tree_reduce(F, per_point)


@partial(jax.jit, static_argnums=(0,))
def _bool_partial_kernel(F, mask, X, Y):
    """0/1-scalar tile -> ONE Jacobian partial sum (masked tree reduce)."""
    P = (X, Y, F.ones((_leading(X),)))
    return cdv.sw_msm_bool(F, mask, P)


@partial(jax.jit, static_argnums=(0,))
def _finish_kernel(F, JX, JY, JZ):
    """(COMBINE_WIDTH,) Jacobian partials -> single affine (x, y, inf)."""
    total = cdv.sw_tree_reduce(F, (JX, JY, JZ))
    one = tuple(_lift0(c) for c in total)
    x, y, inf = cdv.sw_to_affine(F, one)
    return x, y, inf


@partial(jax.jit, static_argnums=(0,))
def _affine_tile_kernel(F, JX, JY, JZ):
    """Batch-normalize a tile of Jacobian points -> (x, y, inf) planes."""
    return cdv.sw_to_affine(F, (JX, JY, JZ))


def _lift0(c):
    if isinstance(c, tuple):
        return tuple(_lift0(ci) for ci in c)
    return c[None]


def _leading(c):
    while isinstance(c, tuple):
        c = c[0]
    return c.shape[0]


def _coord_pad(c, m: int):
    b = _leading(c)
    if b == m:
        return c
    if isinstance(c, tuple):
        return tuple(_coord_pad(ci, m) for ci in c)
    return jnp.pad(c, [(0, m - b)] + [(0, 0)] * (c.ndim - 1))


def _stack_coords(cs):
    if isinstance(cs[0], tuple):
        return tuple(_stack_coords([c[i] for c in cs]) for i in range(len(cs[0])))
    return jnp.stack(cs)


def combine_partials(F, partials):
    """List of single-point Jacobians -> single affine (x, y, inf) via the
    fixed-width finish kernel (hierarchical when > COMBINE_WIDTH chunks)."""
    while len(partials) > COMBINE_WIDTH:
        groups = [
            partials[i : i + COMBINE_WIDTH]
            for i in range(0, len(partials), COMBINE_WIDTH)
        ]
        partials = [_combine_group_jac(F, g) for g in groups]
    JX, JY, JZ = (_coord_pad(_stack_coords([p[i] for p in partials]), COMBINE_WIDTH) for i in range(3))
    # padded rows have Z = 0 -> treated as infinity by the group law
    return _finish_kernel(F, JX, JY, JZ)


@partial(jax.jit, static_argnums=(0,))
def _reduce_group_kernel(F, JX, JY, JZ):
    return cdv.sw_tree_reduce(F, (JX, JY, JZ))


def _combine_group_jac(F, group):
    JX, JY, JZ = (_coord_pad(_stack_coords([p[i] for p in group]), COMBINE_WIDTH) for i in range(3))
    return _reduce_group_kernel(F, JX, JY, JZ)


def _chunks(n: int, m: int):
    for s in range(0, n, m):
        yield s, min(s + m, n)


def msm_device(points: PointArray, scalars, order: int, nbits: int | None = None):
    """sum_i scalars[i] * points[i] -> single affine device point (x, y, inf).

    scalars: python ints (mod `order`) OR a (B, nl) little-endian u64
    canonical-scalar numpy array (the prover's native path).  Classification
    (vectorized): zeros dropped, {0,1} by the masked tree reduction, the
    rest by batched windowed mul; all chunked to the canonical tile.
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

    F = points.F
    T = tile()
    partials = []
    if ones_idx.size:
        sel = points.take(ones_idx.astype(np.int64))
        for s, e in _chunks(len(ones_idx), T):
            chunk = PointArray(F, points.curve, _take_rows(sel.x, s, e), _take_rows(sel.y, s, e)).pad_to(T)
            mask = np.zeros(T, np.uint32)
            mask[: e - s] = 1
            partials.append(_bool_partial_kernel(F, jnp.asarray(mask), chunk.x, chunk.y))
    if gen_idx.size:
        nwin = (nbits + WINDOW_BITS - 1) // WINDOW_BITS
        all_digits = u64_rows_to_digits(rows[gen_idx], nbits)
        sel = points.take(gen_idx.astype(np.int64))
        for s, e in _chunks(len(gen_idx), T):
            chunk = PointArray(F, points.curve, _take_rows(sel.x, s, e), _take_rows(sel.y, s, e)).pad_to(T)
            digits = np.zeros((T, nwin), np.uint32)
            digits[: e - s] = all_digits[s:e]
            partials.append(_windowed_partial_kernel(F, jnp.asarray(digits), chunk.x, chunk.y))
    if not partials:
        return None
    return combine_partials(F, partials)


def _take_rows(c, s: int, e: int):
    if isinstance(c, tuple):
        return tuple(_take_rows(ci, s, e) for ci in c)
    return c[s:e]


def msm(points: PointArray, scalars, order: int, nbits: int | None = None):
    """MSM -> host affine point (or None for the identity)."""
    out = msm_device(points, scalars, order, nbits)
    if out is None:
        return None
    return affine_result_to_host(points.F, points.curve, out)


def affine_result_to_host(F, curve, xyi):
    """Device single affine (x, y, inf) -> host affine point (or None)."""
    x, y, inf = xyi
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


def _host_add(curve, a, b):
    if a is None:
        return b
    if b is None:
        return a
    return curve.add(a, b)
