"""Multi-scalar multiplication over device point batches.

TPU-native replacement for ark-ec's variable-base Pippenger MSM (SURVEY.md
section 2.2 row 2) — the Groth16/KZG hot loop.

Compile-latency-first design (the axon TPU backend compiles remotely, so
every distinct jitted program costs tens of seconds of cold-start):
  * every kernel runs on a FIXED canonical tile shape (`tile()`); callers
    pad/chunk on the host, so the whole framework compiles ONE program per
    (kernel, field) pair regardless of circuit size;
  * kernels fuse their reduction: `_pippenger_partial` / `_bool_partial` map
    a tile of points directly to a single projective partial sum, and chunk
    partials are combined by `_finish` (fixed-width tree reduce + affine
    normalization) — results never round-trip through host bignums;
  * scalars are classified on host: zeros are dropped, 0/1 scalars go
    through the masked tree reduction (the dominant class in Pedersen
    -circuit witnesses), the rest take the batched windowed path;
  * all point arithmetic uses the COMPLETE homogeneous-projective a=0
    formulas (curves.device.swp_*, Renes-Costello-Batina): branchless,
    exception-free, 12M per add vs the ~20M select-cascade Jacobian law —
    the shape the VPU/MXU actually wants.

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
            _TILE = 16384 if jax.default_backend() == "tpu" else 64
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
PIPPENGER_C = 8  # window width of the sort+prefix-scan variable-base MSM


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


def u64_rows_to_bytes(rows: np.ndarray, nbits: int) -> np.ndarray:
    """(B, nl) little-endian u64 scalar rows -> (B, nwin) 8-bit window
    digits, most-significant window first (the Pippenger kernel's input)."""
    rows = np.ascontiguousarray(rows, "<u8")
    b8 = rows.view(np.uint8)  # (B, nl*8) LE bytes
    nwin = (nbits + 7) // 8
    assert nwin <= b8.shape[1]
    return b8[:, nwin - 1 :: -1].astype(np.uint32)  # MSW first


def scalars_to_digits_np(scalars, nbits: int, c: int = WINDOW_BITS) -> np.ndarray:
    """(B, ceil(nbits/c)) window digits, most-significant window first."""
    assert c == WINDOW_BITS
    nwin = (nbits + c - 1) // c
    nl = (nwin * c + 63) // 64
    from zkmember_tpu import native as zknative

    return u64_rows_to_digits(zknative.ints_to_u64(scalars, nl), nbits)


# ---------------------------------------------------------------------------
# curve-ops resolution: host curve -> SWOps (b3 from the curve's b)
# ---------------------------------------------------------------------------


def _small_signed(v: int, p: int) -> int:
    s = v if v <= p // 2 else v - p
    assert abs(s) < 1 << 16, "curve b3 is not small"
    return s


def sw_ops_for_curve(F, curve) -> "cdv.SWOps":
    """Resolve the complete-formula ops bundle for a host SW curve (b3 = 3b
    derived from the host coefficient; cached by curve name)."""
    name = curve.name
    if name in cdv._SW_OPS:
        return cdv._SW_OPS[name]
    b = curve.b
    if hasattr(b, "coeffs"):  # Fp2 coefficient
        p = int(b.coeffs[0].p) if hasattr(b.coeffs[0], "p") else b.coeffs[0].__class__.p
        b3 = tuple(_small_signed(int(c.v) * 3 % p, p) for c in b.coeffs)
    else:
        p = b.p if hasattr(b, "p") else b.__class__.p
        b3 = _small_signed(int(b.v) * 3 % p, p)
    return cdv.sw_ops_for(F, b3, name)


# ---------------------------------------------------------------------------
# tile kernels — one compiled program per (kernel, curve) for any input size
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def _bool_partial_kernel(ops, mask, X, Y):
    """0/1-scalar tile -> ONE projective partial sum (masked tree reduce)."""
    P = cdv.swp_from_affine(ops, X, Y)
    return cdv.swp_msm_bool(ops, mask, P)


def _take_point(P, idx):
    """Gather point rows (tuple-of-coords aware) along the leading axis."""
    def tk(c):
        if isinstance(c, tuple):
            return tuple(tk(ci) for ci in c)
        return jnp.take(c, idx, axis=0)

    return tuple(tk(c) for c in P)


# -- coord helpers over a (W, L, ...) window-batched point grid --------------


def _gather_rows_to_grid(c, order):
    """Gather rows of a (B, ...) coord by a (W, B) index grid -> (W, B, ...)."""
    if isinstance(c, tuple):
        return tuple(_gather_rows_to_grid(ci, order) for ci in c)
    W, B = order.shape
    return jnp.take(c, order.reshape(-1), axis=0).reshape((W, B) + c.shape[1:])


def _stride2_ax1(c, off: int):
    if isinstance(c, tuple):
        return tuple(_stride2_ax1(ci, off) for ci in c)
    return c[:, off::2]


def _drop_last_ax1(c):
    if isinstance(c, tuple):
        return tuple(_drop_last_ax1(ci) for ci in c)
    return c[:, :-1]


def _concat_ax1(a, b):
    if isinstance(a, tuple):
        return tuple(_concat_ax1(ai, bi) for ai, bi in zip(a, b))
    return jnp.concatenate([a, b], axis=1)


def _interleave_ax1(a, b):
    """Pairwise interleave along axis 1: a -> even slots, b -> odd slots."""
    if isinstance(a, tuple):
        return tuple(_interleave_ax1(ai, bi) for ai, bi in zip(a, b))
    W, L = a.shape[0], a.shape[1]
    return jnp.stack([a, b], axis=2).reshape((W, 2 * L) + a.shape[2:])


def _take_ax1(c, idx):
    """Gather along axis 1: c (W, L, ...), idx (W, K) -> (W, K, ...)."""
    if isinstance(c, tuple):
        return tuple(_take_ax1(ci, idx) for ci in c)
    idxe = idx.reshape(idx.shape + (1,) * (c.ndim - 2))
    idxe = jnp.broadcast_to(idxe, idx.shape + c.shape[2:])
    return jnp.take_along_axis(c, idxe, axis=1)


def _blelloch_inclusive_ax1(ops, P, B: int):
    """Work-efficient (Blelloch) inclusive prefix sums along axis 1.

    P: projective points with coords shaped (W, B, ...).  ~2B element
    additions total (vs B*log2(B)/2 for the Hillis-Steele scan this
    replaced), in 2*log2(B) unrolled batched rounds:
      up-sweep:  pair sums halve the width each round (B-1 adds total);
      down-sweep: inclusive[2k+1] = incl_pairs[k] (free),
                  inclusive[2k]   = incl_pairs[k-1] + even[k] (B-1 adds).
    Identity padding is absorbed by the complete group law.
    """
    assert B & (B - 1) == 0
    W = _leading(P[0])
    evens = []
    cur = P
    L = B
    while L > 1:
        e = tuple(_stride2_ax1(c, 0) for c in cur)
        o = tuple(_stride2_ax1(c, 1) for c in cur)
        evens.append(e)
        cur = cdv.swp_add(ops, e, o)  # (W, L/2) pair sums
        L //= 2
    incl = cur  # (W, 1): inclusive scan of the single total
    ident1 = cdv.swp_identity(ops, (W, 1))
    for e in reversed(evens):
        shifted = tuple(
            _concat_ax1(i, _drop_last_ax1(c)) for i, c in zip(ident1, incl)
        )
        ev_incl = cdv.swp_add(ops, shifted, e)
        incl = _interleave_ax1(ev_incl, incl)
    return incl  # (W, B) inclusive prefix sums


def _tree_reduce_ax1(ops, P, L: int):
    """Sum (W, L, ...) points along axis 1 -> (W, ...) points."""
    assert L & (L - 1) == 0
    while L > 1:
        e = tuple(_stride2_ax1(c, 0) for c in P)
        o = tuple(_stride2_ax1(c, 1) for c in P)
        P = cdv.swp_add(ops, e, o)
        L //= 2
    return tuple(_index_ax1_0(c) for c in P)


def _index_ax1_0(c):
    if isinstance(c, tuple):
        return tuple(_index_ax1_0(ci) for ci in c)
    return c[:, 0]


@partial(jax.jit, static_argnums=(0,))
def _pippenger_partial_kernel(ops, digits, X, Y):
    """Sort + prefix-scan Pippenger: (tile, nwin) 8-bit digits -> ONE
    projective partial sum.

    TPU-native bucket accumulation without scatter (SURVEY.md section 7.3
    item 3), with ALL windows processed as one batched (W, B) grid — every
    round is a wide VPU/MXU op instead of a per-window sequential pass:
      1. per-window descending argsort of the digits (one batched sort) and
         point row-gathers onto the (W, B) grid;
      2. batched Blelloch inclusive prefix sums S (2B adds per window);
      3. window sum = sum_i d_i P_i = sum_{v=1..2^c} S_{c_v} with
         c_v = #\\{i : d_i >= v\\} — batched searchsorted + one axis-1
         gather + one 2^c-wide tree reduction (no scatter anywhere);
      4. windows join by Horner on a single running point (c doublings
         each, MSW first).
    """
    F = ops.F
    B = _leading(X)
    nbuckets = 1 << PIPPENGER_C
    digs = jnp.moveaxis(digits, -1, 0).astype(jnp.int32)  # (W, B) MSW first
    W = digs.shape[0]

    order = jnp.argsort(-digs, axis=-1)  # descending per window
    d_s = jnp.take_along_axis(digs, order, axis=-1)
    Xg = _gather_rows_to_grid(X, order)
    Yg = _gather_rows_to_grid(Y, order)
    P = (Xg, Yg, F.ones((W, B)))

    S = _blelloch_inclusive_ax1(ops, P, B)
    ident1 = cdv.swp_identity(ops, (W, 1))
    S_ext = tuple(_concat_ax1(i, s) for i, s in zip(ident1, S))  # (W, B+1)

    d_asc = d_s[:, ::-1]
    thresholds = jnp.arange(1, nbuckets + 1, dtype=jnp.int32)
    # c_v = #{i: d_i >= v} = B - first ascending index with d >= v
    c_v = B - jax.vmap(
        lambda row: jnp.searchsorted(row, thresholds, side="left")
    )(d_asc)
    T = tuple(_take_ax1(c, c_v) for c in S_ext)  # (W, 2^c)
    Wsums = _tree_reduce_ax1(ops, T, nbuckets)  # (W,) points

    def body(acc, wsum):
        for _ in range(PIPPENGER_C):
            acc = cdv.swp_double(ops, acc)
        return cdv.swp_add(ops, acc, wsum), None

    acc, _ = jax.lax.scan(body, cdv.swp_identity(ops, ()), Wsums)
    return acc


@partial(jax.jit, static_argnums=(0,))
def _finish_kernel(ops, JX, JY, JZ):
    """(COMBINE_WIDTH,) projective partials -> single affine (x, y, inf)."""
    total = cdv.swp_tree_reduce(ops, (JX, JY, JZ))
    one = tuple(_lift0(c) for c in total)
    return cdv.swp_to_affine(ops, one)


@partial(jax.jit, static_argnums=(0,))
def _affine_tile_kernel(ops, JX, JY, JZ):
    """Batch-normalize a tile of projective points -> (x, y, inf) planes."""
    return cdv.swp_to_affine(ops, (JX, JY, JZ))


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


def _stack_pad_point(ops, partials):
    """Stack single-point projective partials to (COMBINE_WIDTH, ...); pad
    slots hold the projective identity (0, 1, 0) — absorbed by the complete
    law (a zero-padded Y would NOT be: (0,0,0) is a black hole)."""
    k = len(partials)
    ident = cdv.swp_identity(ops, ())
    pads = [ident] * (COMBINE_WIDTH - k)
    rows = list(partials) + pads
    return tuple(_stack_coords([p[i] for p in rows]) for i in range(3))


def combine_partials(ops, partials):
    """List of single-point projective partials -> single affine (x, y, inf)
    via the fixed-width finish kernel (hierarchical when > COMBINE_WIDTH)."""
    while len(partials) > COMBINE_WIDTH:
        groups = [
            partials[i : i + COMBINE_WIDTH]
            for i in range(0, len(partials), COMBINE_WIDTH)
        ]
        partials = [
            _reduce_group_kernel(ops, *_stack_pad_point(ops, g)) for g in groups
        ]
    return _finish_kernel(ops, *_stack_pad_point(ops, partials))


@partial(jax.jit, static_argnums=(0,))
def _reduce_group_kernel(ops, JX, JY, JZ):
    return cdv.swp_tree_reduce(ops, (JX, JY, JZ))


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
    ops = sw_ops_for_curve(F, points.curve)
    T = tile()
    partials = []
    if ones_idx.size:
        sel = points.take(ones_idx.astype(np.int64))
        for s, e in _chunks(len(ones_idx), T):
            chunk = PointArray(F, points.curve, _take_rows(sel.x, s, e), _take_rows(sel.y, s, e)).pad_to(T)
            mask = np.zeros(T, np.uint32)
            mask[: e - s] = 1
            partials.append(_bool_partial_kernel(ops, jnp.asarray(mask), chunk.x, chunk.y))
    if gen_idx.size:
        nwin = (nbits + 7) // 8
        all_digits = u64_rows_to_bytes(rows[gen_idx], nbits)
        sel = points.take(gen_idx.astype(np.int64))
        for s, e in _chunks(len(gen_idx), T):
            chunk = PointArray(F, points.curve, _take_rows(sel.x, s, e), _take_rows(sel.y, s, e)).pad_to(T)
            digits = np.zeros((T, nwin), np.uint32)
            digits[: e - s] = all_digits[s:e]
            partials.append(_pippenger_partial_kernel(ops, jnp.asarray(digits), chunk.x, chunk.y))
    if not partials:
        return None
    return combine_partials(ops, partials)


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
