"""Gather-free variable-base MSM on limb-major point planes (v2 prover core).

TPU-native replacement for ark-ec's Pippenger MSM (SURVEY.md section 2.2
row 2), superseding msm.msm's sort+prefix-scan kernel for the prove path.

Why not sort-based Pippenger here: the round-3 profile showed the argsort +
row-gather + Blelloch machinery dominating both compile time (unrolled
O(log^2 B) grid rounds) and runtime (gathers across the batch axis defeat
the TPU's lane tiling).  This formulation has the same O(B * lambda/c) add
count but NO data-dependent memory movement at all:

    sum_i s_i P_i  =  sum_w 16^w ( sum_i T_i[d_{i,w}] )

with T_i the per-point small-multiple table [0..15]P_i (Straus), d_{i,w}
the w-th 4-bit digit of s_i.  Per window: a 16-way one-hot select (pure
lane-local mask-adds) + one lane-axis tree reduction.  Cost at B points:
14B (table) + W*B (window reductions) complete adds, W = ceil(bits/4).

Boolean scalars (~17% of the membership-circuit witness: bit
decompositions and path-direction bits) skip the window machinery: one
masked select + a single tree reduction (B adds total).  The bool/general
split is STATIC per circuit (gadget structure), so the proving key carries
the class partition and no per-proof classification or compaction is
needed.

All kernels take runtime-input planes (points, digits, masks), so ONE
compiled program per (curve, B, W) shape serves every query of a proof.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from zkmember_tpu.fields import lm
from zkmember_tpu.curves import device as cdv


WINDOW_BITS = 4
TABLE = 1 << WINDOW_BITS


# ---------------------------------------------------------------------------
# limb-major coordinate helpers (coords may be arrays or Fp2 tuples)
# ---------------------------------------------------------------------------


def _map_coord(f, c):
    if isinstance(c, tuple):
        return tuple(_map_coord(f, ci) for ci in c)
    return f(c)


def _lanes(c):
    while isinstance(c, tuple):
        c = c[0]
    return c.shape[-1]


def _half_split(P):
    """Split a point's lane axis in half: (left, right)."""
    B = _lanes(P[0])
    h = B // 2
    left = tuple(_map_coord(lambda c: c[..., :h], x) for x in P)
    right = tuple(_map_coord(lambda c: c[..., h:], x) for x in P)
    return left, right


TAIL_WIDTH = 256  # fixed-width scan takes over below this lane count


def tree_reduce_lanes(ops, P, keep: int = 1):
    """Sum projective points along the lane axis down to `keep` lanes.

    Two phases, balancing trace size against add count (the fully-unrolled
    log2(B) halving blew up XLA compile time inside the window scan; the
    fully fixed-width scan wastes (log2 B)/2 x the adds — VERDICT round-3
    weak #6):
      1. contiguous half-splits, UNROLLED, while width > TAIL_WIDTH
         (full-lane slices, B - TAIL adds, ~log2(B/TAIL) traced adds);
      2. one SCANNED fixed-width even/odd round for the remaining
         log2(TAIL) rounds (1 traced add, TAIL/2 * log2(TAIL) adds).
    Total adds ~ B + TAIL/2*log2(TAIL) — within ~10% of optimal at the
    prover's tile sizes."""
    B = _lanes(P[0])
    assert B % keep == 0 and (B // keep) & (B // keep - 1) == 0
    tail = min(TAIL_WIDTH, B // keep) * keep
    while B > tail:
        left, right = _half_split(P)
        P = cdv.swp_add(ops, left, right)
        B //= 2
    if B == keep:
        return P
    # fixed-width even/odd rounds: live values interleave to the even lanes,
    # identity refills the tail (absorbed by the complete law)
    F = ops.F
    rounds = (B // keep).bit_length() - 1
    half_ident = cdv.swp_identity(ops, F.batch_shape(P[0])[:-1] + (B // 2,))

    def body(cur, _):
        even = tuple(_map_coord(lambda c: c[..., 0::2], x) for x in cur)
        odd = tuple(_map_coord(lambda c: c[..., 1::2], x) for x in cur)
        s = cdv.swp_add(ops, even, odd)
        cur = tuple(
            _map_coord2(lambda a, b: jnp.concatenate([a, b], axis=-1), x, hi)
            for x, hi in zip(s, half_ident)
        )
        return cur, None

    P, _ = lax.scan(body, P, None, length=rounds)
    return tuple(_map_coord(lambda c: c[..., :keep], x) for x in P)


def _map_coord2(f, a, b):
    if isinstance(a, tuple):
        return tuple(_map_coord2(f, ai, bi) for ai, bi in zip(a, b))
    return f(a, b)


def onehot_select(tab, digits):
    """tab: coord planes with leading table axis (16, ..., n, B); digits:
    (..., B) u32 in [0,16) -> selected (..., n, B) coords.

    Pure lane-local mask-accumulate: sum_d (digits == d) * tab[d]."""

    def one(c):
        if isinstance(c, tuple):
            return tuple(one(ci) for ci in c)
        acc = jnp.zeros(c.shape[1:], c.dtype)
        for d in range(c.shape[0]):
            m = (digits == d)[..., None, :]
            acc = acc + jnp.where(m, c[d], 0)
        return acc

    return tuple(one(c) for c in tab)


def small_table(ops, P1):
    """Per-point multiples [0..15]P as stacked coords (16, ..., n, B).

    A 16-step scan whose body is ONE complete add; entry 0 is the
    projective identity (absorbed by the complete law on digit 0)."""
    F = ops.F
    ident = cdv.swp_identity(ops, F.batch_shape(P1[0]))

    def step(prev, _):
        return cdv.swp_add(ops, prev, P1), prev

    _, tab = lax.scan(step, ident, None, length=TABLE)
    return tab  # tuple of 3 coords, each (16, ..., n, B)


def _take_row(tab, i):
    return tuple(_map_coord(lambda c: c[i], x) for x in tab)


def digits_from_limbs(z, nwin: int):
    """Canonical 16-bit limb planes (..., n, B) -> (nwin, ..., B) 4-bit
    window digits, MOST-significant window first (device-side; avoids
    shipping W*B digit planes over the host link)."""
    outs = []
    for w in range(nwin):  # w = weight of 16^w
        limb = z[..., w // 4, :]
        outs.append((limb >> (WINDOW_BITS * (w % 4))) & (TABLE - 1))
    outs.reverse()
    return jnp.stack(outs)


def window_sums(ops, X, Y, z, nwin: int, wgroup: int = 1):
    """Per-window selected-point sums: coords (W, ..., n, 1), MSW first.

    The lane-parallel half of the MSM (table build + one-hot selects +
    lane reductions); the sequential Horner join lives in horner_join so
    the multi-chip path can all-gather between the two.

    wgroup: windows processed per scan step on a fresh leading axis — the
    occupancy knob.  The limb-major mont_mul saturates near 64k-256k lanes;
    a single-query MSM at B=16k runs the reduction at ~25% of kernel peak,
    so grouping G windows multiplies effective lanes by G (measured: the
    G2 proof MSM at 6 -> ~18 G u32-mults/s)."""
    P = cdv.swp_from_affine(ops, X, Y)
    tab = small_table(ops, P)
    digits = digits_from_limbs(z, nwin)  # (W, ..., B) MSW first
    if wgroup > 1:
        assert nwin % wgroup == 0
        digits = digits.reshape((nwin // wgroup, wgroup) + digits.shape[1:])

    def wbody(_, dig):
        Q = onehot_select(tab, dig)
        return None, tree_reduce_lanes(ops, Q)

    _, S = lax.scan(wbody, None, digits)
    if wgroup > 1:
        S = tuple(
            _map_coord(lambda c: c.reshape((nwin,) + c.shape[2:]), x) for x in S
        )
    return S


def horner_join(ops, S):
    """Window sums (coords (W, ..., n, 1), MSW first) -> one point.

    acc = 16*acc + S_w per window.  Implemented as ONE scan whose body is
    a single complete add: step 5w+k doubles (acc + acc — the RCB complete
    law is exception-free, so doubling IS addition) for k < 4 and adds
    S_w for k == 4.  One traced swp_add instead of four unrolled doubles
    plus an add — the unrolled body was 80k jaxpr ops for Fp2 and set the
    XLA compile time of every MSM program (round-4 dryrun timeout); the
    runtime delta is ~W extra single-lane adds, noise next to the window
    reductions."""
    F = ops.F
    W = _lanes_leading(S)
    ident = cdv.swp_identity(ops, F.batch_shape(S[0])[1:])

    def body(acc, i):
        w = i // (WINDOW_BITS + 1)
        is_add = (i % (WINDOW_BITS + 1)) == WINDOW_BITS
        sw = tuple(
            _map_coord(lambda c: lax.dynamic_index_in_dim(c, w, 0, keepdims=False), x)
            for x in S
        )
        other = cdv.swp_select(ops, jnp.broadcast_to(is_add, F.batch_shape(acc[0])), sw, acc)
        return cdv.swp_add(ops, acc, other), None

    steps = jnp.arange(W * (WINDOW_BITS + 1))
    acc, _ = lax.scan(body, ident, steps)
    return acc


def _lanes_leading(S):
    c = S[0]
    while isinstance(c, tuple):
        c = c[0]
    return c.shape[0]


def msm_kernel(ops, X, Y, z, nwin: int, wgroup: int = 1):
    """Core MSM: affine points (n, B) + canonical scalar limbs (nl, B).

    Zero scalars (including zero-padded lanes — pad coords with anything)
    select table entry 0 = the projective identity, so no masks are needed:
    callers pad points and scalars to a power-of-two lane count and go.
    Returns ONE projective point (coords (n, 1)).
    """
    return horner_join(ops, window_sums(ops, X, Y, z, nwin, wgroup))


@partial(jax.jit, static_argnums=(0,))
def table_program(ops, X, Y):
    """Per-point Straus small-multiple tables as device coord stacks
    (16, ..., n, B).  Tables depend only on the POINTS — i.e. on the
    proving key — so callers build them once at key load and amortize the
    15 complete adds per lane across every proof (straus tables were ~15%
    of per-proof MSM time, round-5 TPU profile)."""
    return small_table(ops, cdv.swp_from_affine(ops, X, Y))


@partial(jax.jit, static_argnums=(0, 2))
def msm_precomp_program(ops, tab, nwin: int, z):
    """MSM from PRECOMPUTED tables via the fused Pallas select+reduce
    kernel (msm.pallas_msm), with the narrow tail reduction + Horner join
    in XLA.  Single-chip fast path for proof MSMs; requires a base-field
    curve (Fp2 G2 keeps the composed path) and lanes divisible by the
    kernel tile."""
    from zkmember_tpu.msm import pallas_msm

    digits = digits_from_limbs(z, nwin)  # (W, ..., B) MSW first
    squeeze = digits.ndim == 2  # no leading row axis: lift to R=1
    if squeeze:
        digits = digits[:, None]
        tab = tuple(_map_coord(lambda c: c[:, None], x) for x in tab)
    fp2 = isinstance(ops.b3, tuple)
    spec = ops.F.spec.base if fp2 else ops.F.spec
    S = pallas_msm.select_reduce(spec, ops.b3, tab, digits)
    if squeeze:
        S = tuple(_map_coord(lambda c: c[:, 0], x) for x in S)
    total = tree_reduce_lanes(ops, S)
    return horner_join(ops, total)


@partial(jax.jit, static_argnums=(0, 2))
def msm_precomp_batch(ops, tab, nwin: int, z):
    """Batched-proof MSM over SHARED precomputed tables (the dp axis of
    BASELINE's proofs/sec metric): z is (P, R, nl, B) — or (P, nl, B) for
    single-row queries — with P independent proofs' scalars against the
    same key points.  Returns projective coords with leading (P, R)."""
    from zkmember_tpu.msm import pallas_msm

    digits = digits_from_limbs(z, nwin)  # (W, P[, R], B)
    squeeze = digits.ndim == 3
    if squeeze:
        digits = digits[:, :, None]  # (W, P, 1, B)
        tab = tuple(_map_coord(lambda c: c[:, None], x) for x in tab)
    fp2 = isinstance(ops.b3, tuple)
    spec = ops.F.spec.base if fp2 else ops.F.spec
    S = pallas_msm.select_reduce(spec, ops.b3, tab, digits)
    if squeeze:
        S = tuple(_map_coord(lambda c: c[:, :, 0], x) for x in S)
    total = tree_reduce_lanes(ops, S)
    return horner_join(ops, total)


def precomp_supported(ops, B: int) -> bool:
    from zkmember_tpu.msm import pallas_msm

    if not pallas_msm.enabled():
        return False
    fp2 = isinstance(ops.b3, tuple)
    spec = getattr(ops.F, "spec", None)
    if spec is None:
        return False
    if fp2:
        if spec.nonresidue != spec.base.p - 1:
            return False  # kernel assumes u^2 = -1
        spec = spec.base
    return B % pallas_msm._tile(spec.n, fp2) == 0


@partial(jax.jit, static_argnums=(0, 4, 5))
def msm_program(ops, X, Y, z, nwin: int, wgroup: int = 1):
    """Jitted MSM returning projective coords (host finishes with bignum).

    One compiled program per (ops, shapes, nwin, wgroup); every Groth16 G1
    query of a proof reuses the same executable with new runtime inputs."""
    return msm_kernel(ops, X, Y, z, nwin, wgroup)


def msm_program_chunked(ops, X, Y, z, nwin: int, wgroup: int = 1,
                        max_lanes: int = 1 << 18):
    """msm_program over lane chunks, combining partials on device.

    The per-point table is 48x the point data (16 entries x 3 projective
    coords); above ~2^18 lanes it no longer fits HBM alongside the key
    planes, so wide MSMs run as lane slices whose single-point partials
    are summed with a handful of complete adds."""
    B = _lanes(X)
    if B <= max_lanes:
        return msm_program(ops, X, Y, z, nwin, wgroup)
    assert B % max_lanes == 0
    acc = None
    for s in range(0, B, max_lanes):
        sl = lambda c: _map_coord(lambda a: a[..., s : s + max_lanes], c)
        part = msm_program(ops, sl(X), sl(Y), sl(z), nwin, wgroup)
        acc = part if acc is None else _add_points_program(ops, acc, part)
    return acc


@partial(jax.jit, static_argnums=(0,))
def _add_points_program(ops, P, Q):
    return cdv.swp_add(ops, P, Q)


# ---------------------------------------------------------------------------
# multi-chip sharding: points sharded across the mesh lane axis, per-window
# partial sums all-gathered over ICI and joined on every device (SPMD — the
# TPU-native replacement for the reference's rayon data parallelism inside
# ark-ec's MSM, SURVEY.md sections 2.3 / 5.8)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def sharded_msm_program(ops, mesh, X, Y, z, nwin: int, wgroup: int = 1):
    """MSM with the point/scalar lane axis sharded over `mesh` axis 'msm'.

    Each device: local Straus window sums over its lane shard (the O(B)
    work).  One all_gather of (W, ..., n, D) single-point partials rides
    ICI; every device then reduces D partials and Horner-joins (tiny,
    replicated).  Lanes must divide evenly by the mesh axis size."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    lane_spec = P(*([None] * (_ndim_coords(X) - 1) + ["msm"]))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(lane_spec, lane_spec, lane_spec),
        out_specs=P(),
        check_rep=False,
    )
    def run(Xl, Yl, zl):
        S = window_sums(ops, Xl, Yl, zl, nwin, wgroup)  # coords (W, ..., n, 1)
        Sg = jax.tree.map(
            lambda c: lax.all_gather(c, "msm", axis=c.ndim - 1, tiled=True), S
        )  # (W, ..., n, D)
        total = tree_reduce_lanes(ops, Sg)
        return horner_join(ops, total)

    return run(X, Y, z)


@partial(jax.jit, static_argnums=(0, 1))
def sharded_bool_msm_program(ops, mesh, X, Y, mask):
    """Boolean-class MSM with lanes sharded over mesh axis 'msm'."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    lane_spec = P(*([None] * (_ndim_coords(X) - 1) + ["msm"]))
    mask_spec = P(*([None] * (mask.ndim - 1) + ["msm"]))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(lane_spec, lane_spec, mask_spec),
        out_specs=P(),
        check_rep=False,
    )
    def run(Xl, Yl, ml):
        F = ops.F
        Pl = cdv.swp_from_affine(ops, Xl, Yl)
        ident = cdv.swp_identity(ops, F.batch_shape(Xl))
        sel = cdv.swp_select(ops, (ml != 0), Pl, ident)
        S = tree_reduce_lanes(ops, sel)  # coords (..., n, 1)
        Sg = jax.tree.map(
            lambda c: lax.all_gather(c, "msm", axis=c.ndim - 1, tiled=True), S
        )
        return tree_reduce_lanes(ops, Sg)

    return run(X, Y, mask)


def _ndim_coords(c):
    while isinstance(c, tuple):
        c = c[0]
    return c.ndim


@partial(jax.jit, static_argnums=(0,))
def bool_msm_program(ops, X, Y, mask):
    """0/1-scalar MSM: one masked select + one lane tree reduction (B-1
    adds total) — the fast path for the boolean witness class, which the
    static circuit analysis routes off the Straus machinery entirely."""
    F = ops.F
    P = cdv.swp_from_affine(ops, X, Y)
    ident = cdv.swp_identity(ops, F.batch_shape(X))
    sel = cdv.swp_select(ops, (mask != 0), P, ident)
    return tree_reduce_lanes(ops, sel)


# ---------------------------------------------------------------------------
# host-side finish: projective limb planes -> host affine point
# ---------------------------------------------------------------------------


def projective_to_host(spec_or_ops, curve, P):
    """Device projective (coords (..., n, 1)) -> host affine point or None.

    The single modular inverse runs in host bignum (pow(z, -1, p)) — three
    orders of magnitude cheaper than a 255-step Fermat scan on device."""
    X, Y, Z = (_squeeze_last(c) for c in (P[0], P[1], P[2]))
    return _proj_host(curve, X, Y, Z)


def _squeeze_last(c):
    if isinstance(c, tuple):
        return tuple(_squeeze_last(ci) for ci in c)
    return np.asarray(c)[..., 0]


def _row(c, i: int):
    """Select row i of a leading batch axis (tuple-of-coords aware)."""
    if isinstance(c, tuple):
        return tuple(_row(ci, i) for ci in c)
    return c[i]


def _limbs_to_int(a) -> int:
    return sum(int(x) << (lm.LIMB_BITS * i) for i, x in enumerate(np.asarray(a)))


def _proj_host(curve, X, Y, Z):
    field = curve.field
    if isinstance(X, tuple):  # Fp2
        f2 = curve.field
        fq = f2.base
        pq = fq.p
        rinv = pow(1 << (lm.LIMB_BITS * X[0].shape[-1]), -1, pq)

        def dec2(c):
            return f2(
                fq(_limbs_to_int(c[0]) * rinv % pq),
                fq(_limbs_to_int(c[1]) * rinv % pq),
            )

        x, y, z = dec2(X), dec2(Y), dec2(Z)
        if z == f2.zero():
            return None
        zi = z.inv()
        return (x * zi, y * zi)

    pq = field.p
    rinv = pow(1 << (lm.LIMB_BITS * X.shape[-1]), -1, pq)
    xv = _limbs_to_int(X) * rinv % pq
    yv = _limbs_to_int(Y) * rinv % pq
    zv = _limbs_to_int(Z) * rinv % pq
    if zv == 0:
        return None
    zi = pow(zv, -1, pq)
    return (field(xv * zi % pq), field(yv * zi % pq))
