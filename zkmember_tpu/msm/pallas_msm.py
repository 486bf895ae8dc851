"""Pallas TPU kernel: fused Straus window select + lane reduction in VMEM.

The round-5 TPU profile of the flagship G1x4 proof MSM (straus.msm_kernel,
B=4x16384, 64 windows): 1.92 s, of which ~1.6 s is the per-window one-hot
select + lane tree-reduction.  The XLA composition issues every complete
point add as ~60 separate fusions (the Pallas mont_mul custom-calls break
the elementwise fusion chains), so each of the ~4M complete adds round-trips
coordinates through HBM many times.

This kernel runs the whole window pipeline for a lane tile inside VMEM:

    tab    (16, R, n, B)  — per-point small-multiple tables [0..15]P_i,
                             projective coords.  Straus tables depend only
                             on the POINTS, i.e. on the proving key: they
                             are precomputed ONCE at key build (the in-proof
                             table build was ~15% of MSM time, now zero).
    digits (W, R, B)      — 4-bit scalar windows, MSW first (per proof).
    out    (W, R, n, NT*KEEP) — per-tile partial window sums, projective.

Grid: (R, B / TILE).  Each program loads its (16, n, TILE) table tile and
digit column once (HBM traffic ~4.6 KB/lane for the whole 64-window MSM vs
~1 KB/lane *per add* before), selects by digit equality masks, and reduces
TILE -> KEEP lanes with unrolled complete-add halvings.  The KEEP tail (and
the Horner join) stay in XLA where lane counts are tiny.

Field/curve math is the same separated-operand Montgomery pipeline and
complete RCB a=0 addition as fields.lm / curves.device (oracle-tested in
tests/test_pallas_msm.py against straus.window_sums).  Reference
capability: ark-ec variable-base MSM (SURVEY.md section 2.2 row 2).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from zkmember_tpu.fields.device import LIMB_BITS, LIMB_MASK, FieldSpec
from zkmember_tpu.fields.lm_pallas import _full_cols, _carry, _sub_limbs


KEEP = 8  # in-kernel reduction stops here; XLA finishes the narrow tail


def _tile(n: int, fp2: bool = False) -> int:
    env = os.environ.get("ZKMEMBER_PALLAS_MSM_TILE")
    if env:
        return int(env)
    if fp2:
        return 512 if n <= 24 else 256
    return 1024 if n <= 24 else 512


# ---------------------------------------------------------------------------
# in-kernel field ops on (n, w) u32 limb planes (limb axis 0 = sublanes)
# ---------------------------------------------------------------------------


def _fadd(n, a, b, Pb):
    s = _carry(a + b, n + 1)
    t = lax.slice_in_dim(s, 0, n, axis=0)
    extra = lax.slice_in_dim(s, n, n + 1, axis=0)  # (1, w) 0/1
    diff, borrow = _sub_limbs(t, Pb, n)
    ge = (1 - borrow) | extra
    return diff * ge + t * (1 - ge)


def _fsub(n, a, b, Pb):
    diff, borrow = _sub_limbs(a, b, n)
    dp = _carry(diff + Pb, n)
    return dp * borrow + diff * (1 - borrow)


def _fmul(n, a, b, Pb, NPb):
    T = _carry(_full_cols(a, b, n, 2 * n), 2 * n)
    T_lo = lax.slice_in_dim(T, 0, n, axis=0)
    m = _carry(_full_cols(T_lo, NPb, n, n), n)
    U = _full_cols(m, Pb, n, 2 * n)
    S = _carry(T + U, 2 * n + 1)
    t_mid = lax.slice_in_dim(S, n, 2 * n, axis=0)
    extra = lax.slice_in_dim(S, 2 * n, 2 * n + 1, axis=0)
    diff, borrow = _sub_limbs(t_mid, Pb, n)
    ge = (1 - borrow) | extra
    return diff * ge + t_mid * (1 - ge)


def _fmul_small(n, x, k: int, Pb):
    """x * k for small signed k via an add chain (k in {3, +-b3})."""
    neg = k < 0
    k = -k if neg else k
    acc = None
    cur = x
    while k:
        if k & 1:
            acc = cur if acc is None else _fadd(n, acc, cur, Pb)
        k >>= 1
        if k:
            cur = _fadd(n, cur, cur, Pb)
    if neg:
        acc = _fsub(n, jnp.zeros_like(acc), acc, Pb)
    return acc


def _rcb_add(A, S, M, mul3, mulb3, P1, P2):
    """Complete projective a=0 addition (RCB15 Alg 7): 12M, branchless.
    Field-agnostic: A/S/M/mul3/mulb3 are the (component-typed) field ops."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t2 = M(Z1, Z2)
    t3 = S(S(M(A(X1, Y1), A(X2, Y2)), t0), t1)  # X1Y2 + X2Y1
    t4 = S(S(M(A(Y1, Z1), A(Y2, Z2)), t1), t2)  # Y1Z2 + Y2Z1
    t5 = S(S(M(A(X1, Z1), A(X2, Z2)), t0), t2)  # X1Z2 + X2Z1
    t0 = mul3(t0)
    t2 = mulb3(t2)
    Z3t = A(t1, t2)
    t1 = S(t1, t2)
    t5 = mulb3(t5)
    X3 = S(M(t3, t1), M(t4, t5))
    Y3 = A(M(t5, t0), M(t1, Z3t))
    Z3 = A(M(Z3t, t4), M(t0, t3))
    return X3, Y3, Z3


def _swp_add(n, b3: int, P1, P2, Pb, NPb):
    M = lambda a, b: _fmul(n, a, b, Pb, NPb)
    A = lambda a, b: _fadd(n, a, b, Pb)
    S = lambda a, b: _fsub(n, a, b, Pb)
    mul3 = lambda x: _fmul_small(n, x, 3, Pb)
    mulb3 = lambda x: _fmul_small(n, x, b3, Pb)
    return _rcb_add(A, S, M, mul3, mulb3, P1, P2)


def _swp_add_fp2(n, b3: tuple, P1, P2, Pb, NPb):
    """Fp2 variant: components are (c0, c1) pairs of (n, w) planes;
    nonresidue u^2 = -1 (BLS12-381 G2), b3 = c0 + c1*u small ints."""

    def A(a, b):
        return (_fadd(n, a[0], b[0], Pb), _fadd(n, a[1], b[1], Pb))

    def S(a, b):
        return (_fsub(n, a[0], b[0], Pb), _fsub(n, a[1], b[1], Pb))

    def M(a, b):  # Karatsuba: 3 base muls
        v0 = _fmul(n, a[0], b[0], Pb, NPb)
        v1 = _fmul(n, a[1], b[1], Pb, NPb)
        t = _fmul(n, _fadd(n, a[0], a[1], Pb), _fadd(n, b[0], b[1], Pb), Pb, NPb)
        return (_fsub(n, v0, v1, Pb), _fsub(n, _fsub(n, t, v0, Pb), v1, Pb))

    def mul3(a):
        return (_fmul_small(n, a[0], 3, Pb), _fmul_small(n, a[1], 3, Pb))

    c0, c1 = b3

    def mulb3(a):  # (c0 + c1 u)(a0 + a1 u), u^2 = -1
        r0 = _fmul_small(n, a[0], c0, Pb) if c0 else None
        if c1:
            m = _fmul_small(n, a[1], c1, Pb)
            r0 = _fsub(n, r0, m, Pb) if r0 is not None else _fsub(
                n, jnp.zeros_like(m), m, Pb
            )
        r1 = _fmul_small(n, a[1], c0, Pb) if c0 else None
        if c1:
            m = _fmul_small(n, a[0], c1, Pb)
            r1 = _fadd(n, r1, m, Pb) if r1 is not None else m
        return (r0, r1)

    return _rcb_add(A, S, M, mul3, mulb3, P1, P2)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


OUT_PAD = 128  # Mosaic wants 128-divisible (or full) trailing block dims


def _roll(c, shift: int):
    """Circular lane roll; pltpu.roll on TPU, jnp.roll in interpret mode."""
    if jax.default_backend() == "tpu":
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.roll(c, shift, 1)
    return jnp.roll(c, shift, axis=1)


def _cmap(f, coord):
    """Map f over a coordinate's components (array or (c0, c1) pair)."""
    if isinstance(coord, tuple):
        return tuple(f(c) for c in coord)
    return f(coord)


def _kernel(n: int, W: int, b3, tile: int, fp2: bool, *refs):
    nc = 2 if fp2 else 1
    tab_refs = refs[: 3 * nc]  # (x0[,x1], y0[,y1], z0[,z1])
    dig_ref = refs[3 * nc]
    p_ref, np_ref = refs[3 * nc + 1], refs[3 * nc + 2]
    out_refs = refs[3 * nc + 3 :]
    Pb = jnp.broadcast_to(p_ref[:], (n, tile))
    NPb = jnp.broadcast_to(np_ref[:], (n, tile))
    swp = _swp_add_fp2 if fp2 else _swp_add

    def window(w, _):
        d = dig_ref[w]  # (1, tile)
        accs = []
        for ref in tab_refs:
            acc = jnp.zeros((n, tile), jnp.uint32)
            for k in range(16):
                m = (d == k).astype(jnp.uint32)  # (1, tile), broadcasts
                acc = acc + ref[k, 0] * m
            accs.append(acc)
        if fp2:
            P = ((accs[0], accs[1]), (accs[2], accs[3]), (accs[4], accs[5]))
        else:
            P = (accs[0], accs[1], accs[2])
        wdt = tile
        while wdt > OUT_PAD:
            h = wdt // 2
            Pb_h = lax.slice_in_dim(Pb, 0, h, axis=1)
            NPb_h = lax.slice_in_dim(NPb, 0, h, axis=1)
            left = tuple(
                _cmap(lambda c: lax.slice_in_dim(c, 0, h, axis=1), x) for x in P
            )
            # the upper half arrives via a half-width circular roll so every
            # slice starts at lane offset 0 (Mosaic cannot mix offsets on
            # non-concat dims; rolls below 64-lane widths do not lower)
            right = tuple(
                _cmap(lambda c: lax.slice_in_dim(_roll(c, h), 0, h, axis=1), x)
                for x in P
            )
            P = swp(n, b3, left, right, Pb_h, NPb_h)
            wdt = h
        # constant-width rotate-folds: lane j += lane j+h; the full tile sum
        # lands in lane 0 (lanes [0, h) stay correct inductively).  Same add
        # count as narrowing but every op is a full 128-lane vreg, and no
        # sub-64 rolls (which do not lower in Mosaic).
        fw = wdt
        Pb_f = lax.slice_in_dim(Pb, 0, fw, axis=1)
        NPb_f = lax.slice_in_dim(NPb, 0, fw, axis=1)
        h = fw // 2
        while h >= 1:
            right = tuple(_cmap(lambda c: _roll(c, fw - h), x) for x in P)
            P = swp(n, b3, P, right, Pb_f, NPb_f)
            h //= 2
        if fw < OUT_PAD:  # small-tile (interpret/test) shapes: pad lanes
            zpad = jnp.zeros((n, OUT_PAD - fw), jnp.uint32)
            P = tuple(
                _cmap(lambda c: jnp.concatenate([c, zpad], axis=1), x) for x in P
            )
        flat = []
        for x in P:
            flat.extend(x if isinstance(x, tuple) else [x])
        for ref, val in zip(out_refs, flat):
            ref[w, 0, 0, 0] = val
        return 0

    lax.fori_loop(0, W, window, 0)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def select_reduce(spec: FieldSpec, b3, tab, digits,
                  tile: int | None = None):
    """tab: (tx, ty, tz) each (16, R, n, B) u32 — or, for Fp2 curves,
    each coord a (c0, c1) pair of such arrays with b3 = (c0, c1) small
    ints.  digits: (W, R, B) u32 in [0, 16).  Returns (sx, sy, sz) with
    the same component structure, shapes (W, R, n, B/tile): per-tile
    projective partial window sums (zero digit lanes select the identity
    via table entry 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fp2 = isinstance(tab[0], tuple)
    planes = [c for coord in tab for c in (coord if fp2 else (coord,))]
    _, R, n, B = planes[0].shape
    batched = digits.ndim == 4  # (W, P, R, B): P proofs sharing the tables
    P = digits.shape[1] if batched else 1
    if not batched:
        digits = digits[:, None]
    if digits.shape[0] % 8:
        # pad to a Mosaic-friendly window count with leading zero windows
        # (MSW first: identity selections, absorbed by the Horner join)
        pad = 8 - digits.shape[0] % 8
        digits = jnp.concatenate(
            [jnp.zeros((pad,) + digits.shape[1:], digits.dtype), digits]
        )
    W = digits.shape[0]
    tb = tile or min(_tile(n, fp2), B)
    assert B % tb == 0, (B, tb)
    NT = B // tb
    p_col = jnp.asarray(spec.p_limbs.reshape(n, 1))
    np_col = jnp.asarray(spec.nprime_limbs.reshape(n, 1))
    dig_flat = digits.reshape(W, P * R * B)  # trailing-dim blocks for Mosaic

    out = jax.ShapeDtypeStruct((W, P, R, NT, n, OUT_PAD), jnp.uint32)
    coord_spec = pl.BlockSpec((16, 1, n, tb), lambda p, r, t: (0, r, 0, t),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (W, 1, 1, 1, n, OUT_PAD), lambda p, r, t: (0, p, r, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, n, W, b3, tb, fp2),
        out_shape=tuple(out for _ in planes),
        grid=(P, R, NT),
        in_specs=[coord_spec] * len(planes) + [
            pl.BlockSpec(
                (W, tb),
                lambda p, r, t, R=R, NT=NT: (0, (p * R + r) * NT + t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n, 1), lambda p, r, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda p, r, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_spec for _ in planes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*planes, dig_flat, p_col, np_col)

    # (W, P, R, NT, n, OUT_PAD) -> live lane 0 of each tile: (W[, P], R, n, NT)
    def live(s):
        s = s[..., :1]  # (W, P, R, NT, n, 1)
        s = jnp.moveaxis(s, 3, 4)  # (W, P, R, n, NT, 1)
        s = s.reshape(W, P, R, n, NT)
        return s if batched else s[:, 0]

    if fp2:
        return tuple(
            (live(outs[2 * i]), live(outs[2 * i + 1])) for i in range(3)
        )
    return live(outs[0]), live(outs[1]), live(outs[2])


def enabled() -> bool:
    return os.environ.get("ZKMEMBER_PALLAS_MSM", "1") != "0"
