"""Device (TPU) elliptic-curve group kernels: batched, SoA limb-plane layout.

TPU-native replacement for the `ark-ec` group-law surface the reference
consumes (SURVEY.md section 2.2 row 2).  All functions are generic over a
field-ops vtable (`FpOps` / `Fp2Ops` from zkmember_tpu.fields.device), so
the same code drives:
  * BLS12-381 G1 (a=0 short Weierstrass over Fq)
  * BLS12-381 G2 (a=0 short Weierstrass over Fq2)
  * BW6-761 G1/G2 (a=0 short Weierstrass over Fq, both over the base field)
  * Jubjub / ed-on-bw6 (a=-1-style twisted Edwards, generic `a`)

Layouts:
  * SW points: Jacobian (X, Y, Z) tuples of field elements; Z == 0 encodes
    the point at infinity.  Batched adds/doubles are fully data-parallel,
    with the doubling / infinity special cases handled by masks (select),
    never by control flow — XLA sees a single straight-line program.
  * TE points: extended coordinates (X, Y, T, Z) with the unified complete
    addition law, so no masks are needed at all (the reference's Pedersen
    hash only ever adds subgroup points).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# short Weierstrass, a = 0 (all four pairing groups we ship have a = 0)
# Jacobian coordinates: (X, Y, Z), affine = (X/Z^2, Y/Z^3), Z=0 => infinity.
# ---------------------------------------------------------------------------


def sw_infinity(F, shape=()):
    return (F.zeros(shape), F.ones(shape), F.zeros(shape))


def sw_is_infinity(F, P):
    return F.is_zero(P[2])


def sw_double(F, P):
    """Jacobian doubling for a=0 (dbl-2009-l).  Infinity (Z=0) stays put."""
    X, Y, Z = P
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    t = F.sqr(F.add(X, B))
    D = F.double(F.sub(F.sub(t, A), C))  # 2((X+B)^2 - A - C)
    E = F.add(F.double(A), A)  # 3A
    G = F.sqr(E)
    X3 = F.sub(G, F.double(D))
    eight_c = F.double(F.double(F.double(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), eight_c)
    Z3 = F.double(F.mul(Y, Z))
    return (X3, Y3, Z3)


def sw_add(F, P, Q):
    """Complete batched Jacobian addition via masks (add-2007-bl + cases)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    R = F.sub(S2, S1)

    # generic case
    HH = F.sqr(H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    X3 = F.sub(F.sub(F.sqr(R), HHH), F.double(V))
    Y3 = F.sub(F.mul(R, F.sub(V, X3)), F.mul(S1, HHH))
    Z3 = F.mul(H, F.mul(Z1, Z2))
    gen = (X3, Y3, Z3)

    dbl = sw_double(F, P)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(R)
    same = jnp.logical_and(h_zero, r_zero)  # P == Q -> double
    opposite = jnp.logical_and(h_zero, jnp.logical_not(r_zero))  # P == -Q -> inf

    def sel(c, a, b):
        return F.select(c, a, b)

    inf = sw_infinity(F, _batch_shape(F, X1))
    outX = sel(same, dbl[0], gen[0])
    outY = sel(same, dbl[1], gen[1])
    outZ = sel(same, dbl[2], gen[2])
    outX = sel(opposite, inf[0], outX)
    outY = sel(opposite, inf[1], outY)
    outZ = sel(opposite, inf[2], outZ)
    # P at infinity -> Q; Q at infinity -> P (applied last, highest priority)
    outX = sel(q_inf, X1, outX)
    outY = sel(q_inf, Y1, outY)
    outZ = sel(q_inf, Z1, outZ)
    outX = sel(p_inf, X2, outX)
    outY = sel(p_inf, Y2, outY)
    outZ = sel(p_inf, Z2, outZ)
    return (outX, outY, outZ)


def sw_cond_add(F, P, Q, bit):
    """P + Q where bit==1 else P.  bit: batch-shaped 0/1 array."""
    S = sw_add(F, P, Q)
    m = bit != 0
    return (F.select(m, S[0], P[0]), F.select(m, S[1], P[1]), F.select(m, S[2], P[2]))


def sw_neg(F, P):
    return (P[0], F.neg(P[1]), P[2])


def _batch_shape(F, x):
    # field element batch dims (strip limb axis / use vtable helper)
    if isinstance(x, tuple):
        return x[0].shape[:-1]
    return x.shape[:-1]


def sw_scalar_mul(F, scalar_bits, P):
    """Batched double-and-add: scalar_bits (B, nbits) MSB-first 0/1 uint32.

    P: batched Jacobian point.  Scanned over bit columns, so the trace holds
    one double + one masked add regardless of scalar width.
    """
    nbits = scalar_bits.shape[-1]
    bits_t = jnp.moveaxis(scalar_bits, -1, 0)  # (nbits, B)
    acc0 = sw_infinity(F, _batch_shape(F, P[0]))

    def body(acc, bit):
        acc = sw_double(F, acc)
        acc = sw_cond_add(F, acc, P, bit)
        return acc, None

    acc, _ = lax.scan(body, acc0, bits_t)
    return acc


def _gather_coord(c, idx):
    """Gather along a leading table axis: c (T, B..., n), idx (B,) -> (B..., n)."""
    if isinstance(c, tuple):
        return tuple(_gather_coord(ci, idx) for ci in c)
    idxe = idx.reshape(idx.shape + (1,) * (c.ndim - 1 - idx.ndim))
    idxe = jnp.broadcast_to(idxe[None], (1,) + c.shape[1:])
    return jnp.take_along_axis(c, idxe, axis=0)[0]


def sw_scalar_mul_windowed(F, digits, P, c_bits: int = 4):
    """Batched windowed (Straus) scalar mul: ~2x fewer muls than double-add.

    digits: (B, n_windows) uint32 window digits, MOST-significant window
    first, each < 2^c_bits.  Builds the per-point small-multiple table
    [0]P..[2^c-1]P (2^c-2 batched adds), then per window: c doublings + one
    table gather + one add.  ~(8c + 16)/c muls per bit vs 24 for double-add.
    """
    nwin = digits.shape[-1]
    T = 1 << c_bits
    inf = sw_infinity(F, _batch_shape(F, P[0]))

    # small-multiple table [0]P..[T-1]P via a scan (one add in the trace)
    def tstep(prev, _):
        return sw_add(F, prev, P), prev

    _, tab = lax.scan(tstep, inf, None, length=T)
    TX, TY, TZ = tab  # leading axis T: entry j = [j]P

    acc0 = inf
    digits_t = jnp.moveaxis(digits, -1, 0)  # (nwin, B)

    def body(acc, dig):
        for _ in range(c_bits):
            acc = sw_double(F, acc)
        Q = (
            _gather_coord(TX, dig),
            _gather_coord(TY, dig),
            _gather_coord(TZ, dig),
        )
        acc = sw_add(F, acc, Q)
        return acc, None

    acc, _ = lax.scan(body, acc0, digits_t)
    return acc


def sw_to_affine(F, P):
    """Batch-normalize Jacobian -> affine (x, y, inf_mask)."""
    X, Y, Z = P
    zinv = F.inv(Z)  # inv(0) = 0 under Fermat -> infinity maps to (0, 0)
    zinv2 = F.sqr(zinv)
    x = F.mul(X, zinv2)
    y = F.mul(Y, F.mul(zinv2, zinv))
    return x, y, sw_is_infinity(F, P)


def sw_tree_reduce(F, P):
    """Sum a batch of Jacobian points along axis 0 via log2 rounds of adds.

    P coords have shape (B, ..., n); B need not be a power of two.
    Returns the total as a point with batch shape (...).

    Implemented as a lax.scan of log2(B) even/odd halving rounds on a
    FIXED-width buffer (tail slots refilled with infinity), so the trace
    holds exactly one batched addition regardless of B.
    """
    X, Y, Z = P
    B = X.shape[0] if not isinstance(X, tuple) else X[0].shape[0]

    def pad_to(c, m):
        if isinstance(c, tuple):
            return tuple(pad_to(ci, m) for ci in c)
        pad = [(0, m - c.shape[0])] + [(0, 0)] * (c.ndim - 1)
        return jnp.pad(c, pad)

    m = 1
    while m < B:
        m *= 2
    if m != B:
        # pad with infinity: Z=0 rows; X/Y zeros are fine
        X, Y, Z = pad_to(X, m), pad_to(Y, m), pad_to(Z, m)
    if m == 1:
        return tuple(
            c[0] if not isinstance(c, tuple) else tuple(ci[0] for ci in c)
            for c in (X, Y, Z)
        )

    def even(c):
        if isinstance(c, tuple):
            return tuple(even(ci) for ci in c)
        return c[0::2]

    def odd(c):
        if isinstance(c, tuple):
            return tuple(odd(ci) for ci in c)
        return c[1::2]

    def refill(c, filler):
        # (m/2,...) result back to (m,...): tail = infinity filler
        if isinstance(c, tuple):
            return tuple(refill(ci, fi) for ci, fi in zip(c, filler))
        return jnp.concatenate([c, filler], axis=0)

    inf_half = sw_infinity(F, (m // 2,) + _batch_shape(F, X)[1:])
    rounds = m.bit_length() - 1

    def body(cur, _):
        left = tuple(even(c) for c in cur)
        right = tuple(odd(c) for c in cur)
        s = sw_add(F, left, right)
        cur = tuple(refill(c, f) for c, f in zip(s, inf_half))
        return cur, None

    cur, _ = lax.scan(body, (X, Y, Z), None, length=rounds)
    return tuple(
        c[0] if not isinstance(c, tuple) else tuple(ci[0] for ci in c) for c in cur
    )


def sw_msm(F, scalar_bits, P):
    """Variable-base MSM: sum_i s_i * P_i.

    scalar_bits: (B, nbits) MSB-first; P: batched Jacobian points (B, ...).
    v1 strategy (see SURVEY.md section 7.3 item 3): fully batched per-point
    double-and-add followed by a log2(B) Jacobian tree reduction — every
    step is a B-wide VPU op.  Pippenger bucketing lands on top of this later.
    """
    per_point = sw_scalar_mul(F, scalar_bits, P)
    return sw_tree_reduce(F, per_point)


def sw_msm_bool(F, mask, P):
    """MSM where every scalar is 0/1 — a single masked tree reduction.

    This is the dominant MSM shape in Pedersen-hash circuits: most of the
    Groth16 witness is Boolean (bit decompositions), so sum_i b_i * A_i
    needs B point-adds total instead of 2*nbits*B (SURVEY.md section 7.3
    item 5 — witness-structure-aware proving).
    """
    inf = sw_infinity(F, _batch_shape(F, P[0]))
    m = mask != 0
    sel = (
        F.select(m, P[0], inf[0]),
        F.select(m, P[1], inf[1]),
        F.select(m, P[2], inf[2]),
    )
    return sw_tree_reduce(F, sel)


# ---------------------------------------------------------------------------
# short Weierstrass, a = 0, COMPLETE homogeneous-projective formulas
# (Renes-Costello-Batina 2015, Algorithms 7 & 9).  (X, Y, Z), affine =
# (X/Z, Y/Z), identity = (0, 1, 0).  Branchless and exception-free: the
# one-true group law for batched TPU kernels — no embedded doubling, no
# select cascade, identity/doubling/negation inputs all fall out correctly.
# Cost: add 12M (2 of them by-3b, i.e. cheap chains), double 7M.
# ---------------------------------------------------------------------------


def _mul_small(F, x, k: int):
    """x * k for a small signed integer k via a double-and-add chain."""
    assert k != 0
    negk = k < 0
    k = -k if negk else k
    acc = None
    cur = x
    while k:
        if k & 1:
            acc = cur if acc is None else F.add(acc, cur)
        k >>= 1
        if k:
            cur = F.double(cur)
    return F.neg(acc) if negk else acc


def _fp2_mul_small_pair(F, a, c0: int, c1: int):
    """Fp2 multiply by a small constant c0 + c1*u (nonresidue u^2 = -1)."""
    assert F.spec.nonresidue == F.spec.base.p - 1, "small-pair path assumes nr=-1"
    base = F.base
    a0, a1 = a
    r0_parts = []
    r1_parts = []
    if c0:
        r0_parts.append(_mul_small(base, a0, c0))
        r1_parts.append(_mul_small(base, a1, c0))
    if c1:
        r0_parts.append(_mul_small(base, a1, -c1))  # nr * c1 * a1
        r1_parts.append(_mul_small(base, a0, c1))
    r0 = r0_parts[0] if len(r0_parts) == 1 else base.add(*r0_parts)
    r1 = r1_parts[0] if len(r1_parts) == 1 else base.add(*r1_parts)
    return (r0, r1)


class SWOps:
    """a=0 short-Weierstrass curve ops bundle for the RCB complete formulas.

    b3: 3*b as a small signed int (base-field curves) or an (int, int) pair
    (Fp2 curves, b3 = c0 + c1*u).  Hash/eq by name so instances key jit
    caches stably (use the module-level `sw_ops_for` singletons).
    """

    def __init__(self, F, b3, name: str):
        self.F = F
        self.b3 = b3
        self.name = name
        if isinstance(b3, tuple):
            self._mb3 = lambda x: _fp2_mul_small_pair(F, x, *b3)
        else:
            self._mb3 = lambda x: _mul_small(F, x, b3)

    def mul_b3(self, x):
        return self._mb3(x)

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, o):
        return isinstance(o, SWOps) and o.name == self.name

    def __repr__(self):
        return f"SWOps({self.name})"


_SW_OPS: dict = {}


def sw_ops_for(F, b3, name: str) -> SWOps:
    if name not in _SW_OPS:
        _SW_OPS[name] = SWOps(F, b3, name)
    return _SW_OPS[name]


def swp_identity(ops: SWOps, shape=()):
    F = ops.F
    return (F.zeros(shape), F.ones(shape), F.zeros(shape))


def swp_is_identity(ops: SWOps, P):
    return ops.F.is_zero(P[2])


def swp_from_affine(ops: SWOps, x, y):
    F = ops.F
    shape = F.batch_shape(x)
    return (x, y, F.ones(shape))


def swp_add(ops: SWOps, P, Q):
    """Complete projective addition (RCB15 Alg. 7, a=0): 12M, branchless.

    The 12 field products are issued as TWO stacked multiplies of 6
    independent rows each (F.mul_many) — the MXU wants one fat matmul per
    dependency wave, not twelve thin ones (see fields.device.mont_mul_many).
    """
    F = ops.F
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0, t1, t2, t3, t4, ty = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ]
    )
    t3 = F.sub(t3, F.add(t0, t1))  # X1Y2 + X2Y1
    t4 = F.sub(t4, F.add(t1, t2))  # Y1Z2 + Y2Z1
    ty = F.sub(ty, F.add(t0, t2))  # X1Z2 + X2Z1
    t0 = _mul_small(F, t0, 3)  # 3 X1X2
    t2 = ops.mul_b3(t2)  # b3 Z1Z2
    Z3 = F.add(t1, t2)  # Y1Y2 + b3 Z1Z2
    t1 = F.sub(t1, t2)  # Y1Y2 - b3 Z1Z2
    ty = ops.mul_b3(ty)  # b3 (X1Z2 + X2Z1)
    m0, m1, m2, m3, m4, m5 = F.mul_many(
        [(t3, t1), (t4, ty), (ty, t0), (t1, Z3), (Z3, t4), (t0, t3)]
    )
    return (F.sub(m0, m1), F.add(m2, m3), F.add(m4, m5))


def swp_double(ops: SWOps, P):
    """Complete projective doubling (RCB15 Alg. 9, a=0): 7M, branchless.

    Issued as two stacked multiply waves of 4 rows each (see swp_add)."""
    F = ops.F
    X, Y, Z = P
    t0, t1, zz, xy = F.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    Z3 = _mul_small(F, t0, 8)  # 8Y^2
    t2 = ops.mul_b3(zz)  # b3 Z^2
    Y3 = F.add(t0, t2)
    t0 = F.sub(t0, _mul_small(F, t2, 3))
    X3w, Z3w, Y3w, XYw = F.mul_many(
        [(t2, Z3), (t1, Z3), (t0, Y3), (t0, xy)]
    )
    return (F.double(XYw), F.add(X3w, Y3w), Z3w)


def swp_select(ops: SWOps, mask, P, Q):
    F = ops.F
    return tuple(F.select(mask, a, b) for a, b in zip(P, Q))


def swp_to_affine(ops: SWOps, P):
    """Batch-normalize projective -> affine (x, y, is_identity)."""
    F = ops.F
    X, Y, Z = P
    zinv = F.inv(Z)  # inv(0) = 0 under Fermat -> identity maps to (0, 0)
    return F.mul(X, zinv), F.mul(Y, zinv), swp_is_identity(ops, P)


def swp_tree_reduce(ops: SWOps, P):
    """Sum a batch of projective points along axis 0 (log2 rounds of adds).

    Same fixed-width scan structure as sw_tree_reduce; padding slots are the
    projective identity (0, 1, 0), which the complete law absorbs.
    """
    F = ops.F
    X, Y, Z = P
    B = _leading0(X)

    m = 1
    while m < B:
        m *= 2
    ident = swp_identity(ops, (1,) + _batch_shape(F, X)[1:])
    if m != B:
        X = _pad_with(X, ident[0], m)
        Y = _pad_with(Y, ident[1], m)
        Z = _pad_with(Z, ident[2], m)
    if m == 1:
        return tuple(_index0(c) for c in (X, Y, Z))

    half_ident = swp_identity(ops, (m // 2,) + _batch_shape(F, X)[1:])
    rounds = m.bit_length() - 1

    def body(cur, _):
        left = tuple(_stride2(c, 0) for c in cur)
        right = tuple(_stride2(c, 1) for c in cur)
        s = swp_add(ops, left, right)
        cur = tuple(_concat0(c, f) for c, f in zip(s, half_ident))
        return cur, None

    cur, _ = lax.scan(body, (X, Y, Z), None, length=rounds)
    return tuple(_index0(c) for c in cur)


def _leading0(c):
    while isinstance(c, tuple):
        c = c[0]
    return c.shape[0]


def _pad_with(c, filler, m):
    if isinstance(c, tuple):
        return tuple(_pad_with(ci, fi, m) for ci, fi in zip(c, filler))
    b = c.shape[0]
    if b == m:
        return c
    tail = jnp.broadcast_to(filler[:1], (m - b,) + c.shape[1:])
    return jnp.concatenate([c, tail], axis=0)


def _stride2(c, off):
    if isinstance(c, tuple):
        return tuple(_stride2(ci, off) for ci in c)
    return c[off::2]


def _concat0(c, f):
    if isinstance(c, tuple):
        return tuple(_concat0(ci, fi) for ci, fi in zip(c, f))
    return jnp.concatenate([c, f], axis=0)


def _index0(c):
    if isinstance(c, tuple):
        return tuple(_index0(ci) for ci in c)
    return c[0]


def swp_msm_bool(ops: SWOps, mask, P):
    """MSM with 0/1 scalars: mask to identity, one tree reduction."""
    ident = swp_identity(ops, _batch_shape(ops.F, P[0]))
    sel = swp_select(ops, mask != 0, P, ident)
    return swp_tree_reduce(ops, sel)


def swp_scalar_mul_windowed(ops: SWOps, digits, P, c_bits: int = 4):
    """Batched windowed (Straus) scalar mul on complete projective points.

    digits: (B, n_windows) uint32, MSW first.  Table entry 0 is the
    projective identity — the complete law makes digit-0 adds a no-op, so
    there is no masking anywhere.
    """
    F = ops.F
    T = 1 << c_bits
    ident = swp_identity(ops, _batch_shape(F, P[0]))

    def tstep(prev, _):
        return swp_add(ops, prev, P), prev

    _, tab = lax.scan(tstep, ident, None, length=T)

    digits_t = jnp.moveaxis(digits, -1, 0)  # (nwin, B)

    def body(acc, dig):
        acc = lax.fori_loop(0, c_bits, lambda _, a: swp_double(ops, a), acc)
        Q = tuple(_gather_coord(t, dig) for t in tab)
        acc = swp_add(ops, acc, Q)
        return acc, None

    acc, _ = lax.scan(body, ident, digits_t)
    return acc


# ---------------------------------------------------------------------------
# twisted Edwards, extended coordinates, unified complete addition
#   a x^2 + y^2 = 1 + d x^2 y^2;   (X, Y, T, Z), x = X/Z, y = Y/Z, T = XY/Z
# ---------------------------------------------------------------------------


class TEConsts:
    """Curve constants a, d as Montgomery-form limb arrays.

    Accepts numpy constants (trace-time) OR traced jax arrays (when a
    kernel takes the constants as runtime arguments — see
    hash.pedersen._hash_kernel)."""

    def __init__(self, a_mont, d_mont):
        self.a = a_mont if hasattr(a_mont, "aval") else np.asarray(a_mont)
        self.d = d_mont if hasattr(d_mont, "aval") else np.asarray(d_mont)


def te_identity(F, shape=()):
    return (F.zeros(shape), F.ones(shape), F.zeros(shape), F.ones(shape))


def te_add(F, C: TEConsts, P, Q):
    """Unified extended addition (add-2008-hwcd), complete for our curves.

    Three stacked multiply waves (5 + 2 + 4 rows; see swp_add)."""
    X1, Y1, T1, Z1 = P
    X2, Y2, T2, Z2 = Q
    a = F.broadcast_const(C.a, _batch_shape(F, X1))
    d = F.broadcast_const(C.d, _batch_shape(F, X1))
    A, B, D, Emul, dT1 = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (d, T1),
        ]
    )
    Cc, aA = F.mul_many([(dT1, T2), (a, A)])
    E = F.sub(F.sub(Emul, A), B)
    Fv = F.sub(D, Cc)
    G = F.add(D, Cc)
    H = F.sub(B, aA)
    X3, Y3, T3, Z3 = F.mul_many([(E, Fv), (G, H), (E, H), (Fv, G)])
    return (X3, Y3, T3, Z3)


def te_add_affine_const(F, C: TEConsts, P, qx_mont, qy_mont):
    """P + Q where Q is a *constant affine* point broadcast over the batch.

    Z2 = 1, T2 = qx*qy precomputed at trace time: saves 2 muls and the
    broadcast bookkeeping — this is the Pedersen hash inner loop.
    qx_mont/qy_mont: (n,) or (B, n) Montgomery limb arrays.
    Three stacked multiply waves (5 + 2 + 4 rows; see swp_add).
    """
    X1, Y1, T1, Z1 = P
    shape = _batch_shape(F, X1)
    qx = jnp.broadcast_to(jnp.asarray(qx_mont), tuple(shape) + (qx_mont.shape[-1],))
    qy = jnp.broadcast_to(jnp.asarray(qy_mont), tuple(shape) + (qy_mont.shape[-1],))
    a = F.broadcast_const(C.a, shape)
    d = F.broadcast_const(C.d, shape)
    A, B, T2, Emul, dT1 = F.mul_many(
        [(X1, qx), (Y1, qy), (qx, qy), (F.add(X1, Y1), F.add(qx, qy)), (d, T1)]
    )
    Cc, aA = F.mul_many([(dT1, T2), (a, A)])
    E = F.sub(F.sub(Emul, A), B)
    Fv = F.sub(Z1, Cc)
    G = F.add(Z1, Cc)
    H = F.sub(B, aA)
    X3, Y3, T3, Z3 = F.mul_many([(E, Fv), (G, H), (E, H), (Fv, G)])
    return (X3, Y3, T3, Z3)


def te_cond_add_affine(F, C: TEConsts, P, qx_mont, qy_mont, bit):
    """P + Q if bit else P (constant affine Q) — the per-bit Pedersen step."""
    S = te_add_affine_const(F, C, P, qx_mont, qy_mont)
    m = bit != 0
    return tuple(F.select(m, s, p) for s, p in zip(S, P))


def te_double(F, C: TEConsts, P):
    return te_add(F, C, P, P)


def te_scalar_mul(F, C: TEConsts, scalar_bits, P):
    """Batched double-and-add over extended TE points (MSB-first bits)."""
    bits_t = jnp.moveaxis(scalar_bits, -1, 0)
    acc0 = te_identity(F, _batch_shape(F, P[0]))

    def body(acc, bit):
        acc = te_double(F, C, acc)
        S = te_add(F, C, acc, P)
        m = bit != 0
        acc = tuple(F.select(m, s, a) for s, a in zip(S, acc))
        return acc, None

    acc, _ = lax.scan(body, acc0, bits_t)
    return acc


def te_to_affine(F, P):
    X, Y, T, Z = P
    zinv = F.inv(Z)
    return F.mul(X, zinv), F.mul(Y, zinv)
