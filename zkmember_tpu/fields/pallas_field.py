"""Pallas TPU kernel for batched Montgomery multiplication.

Why this exists: the XLA-composed mont_mul (fields.device) materializes its
intermediates in HBM — the (B, n, n) broadcast product, the lo/hi splits,
the (B, 2n^2) f32 term matrix, and ~36 small carry ops — ~300 MB of traffic
per 4096-row call, making every curve operation HBM-bound (~400 us/call
measured on v5e, ~7x off the MXU roofline).  This kernel runs the whole
pipeline per batch tile inside VMEM: one HBM read of the operands, one HBM
write of the product, everything else on-chip.

Math (identical to fields.device.mont_mul, verified bit-exactly against it
on device in tests/test_device_fields.py):
    T = a * b                 (schoolbook columns via one exact-f32 MXU dot)
    m = T_lo * N' mod R       (low-half columns dot)
    S = T + m * p             (second full dot + column add)
    t = S / R; t -= p if t >= p

Layout: operands are (B, n) uint32 16-bit-limb rows.  The kernel tiles B on
a 1D grid; each program handles (TILE, n).  Column routing uses the same
constant 0/1 matrix as the XLA path (exact: every f32 operand < 2^24); the
routing matrices and the modulus/nprime limb rows ride along as replicated
kernel inputs (pallas forbids captured constants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv


import os

_MODE = None  # "shift" | "dot" (resolved once from env; dot is default)


def _mode(n: int) -> str:
    """dot (MXU routing matmul) for the BLS limb counts; shift-accumulate
    for the 48-limb BW6 base field, whose 2n^2-wide term matrix blows the
    VMEM budget."""
    if _MODE is not None:
        return _MODE
    env = os.environ.get("ZKMEMBER_PALLAS_MODE")
    if env:
        return env
    return "dot" if n <= 24 else "shift"


def _tile_for(n: int) -> int:
    """Batch rows per program instance, sized to the VMEM budget: the
    (T, 2n^2) f32 term matrix is the big resident (dot mode)."""
    env = os.environ.get("ZKMEMBER_PALLAS_TILE")
    if env:
        return int(env)
    if n <= 16:
        return 1024
    return 512 if n <= 24 else 128


def _full_cols_vmem(a_u32, b_u32, n: int, out_len: int, diag=None):
    """Schoolbook product columns inside the kernel (values in VMEM).

    a_u32/b_u32: (T, n) uint32 limbs < 2^16.  Returns (T, out_len) uint32
    column sums < 2n * 2^16 < 2^23.  Shift-and-accumulate over the n limbs
    of b: each step is one broadcast u32 multiply + lo/hi split + two
    statically-shifted adds — pure VPU work on VMEM-resident vectors.
    (The XLA path's 3D-product + routing-matmul formulation needs a
    (T, n, n) -> (T, n^2) reshape Mosaic cannot lower.)
    """
    t = a_u32.shape[0]

    def shifted(x, left: int, width: int):
        """x[:, :width] placed at column `left` of an (t, out_len) row;
        zero-width concat segments are skipped (Mosaic rejects them)."""
        parts = []
        if left > 0:
            parts.append(jnp.zeros((t, left), jnp.uint32))
        parts.append(jax.lax.slice_in_dim(x, 0, width, axis=1))
        right = out_len - left - width
        if right > 0:
            parts.append(jnp.zeros((t, right), jnp.uint32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    if _mode(n) == "dot":
        # build the (T, 2n^2) f32 term matrix by lane-concatenation (the 3D
        # (T,n,n) -> (T,n^2) reshape is not lowerable), then route every
        # term to its output column with ONE exact-f32 MXU matmul.
        pieces = []
        for j in range(n):
            bj = jax.lax.slice_in_dim(b_u32, j, j + 1, axis=1)  # (T, 1)
            prod = a_u32 * bj  # (T, n) exact u32
            pieces.append(prod & dv.LIMB_MASK)
        for j in range(n):
            bj = jax.lax.slice_in_dim(b_u32, j, j + 1, axis=1)
            prod = a_u32 * bj
            pieces.append(prod >> dv.LIMB_BITS)
        terms = jnp.concatenate(pieces, axis=1).astype(jnp.int32).astype(
            jnp.float32
        )  # (T, 2n^2), each term < 2^16
        cols = jax.lax.dot_general(
            terms,
            diag,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return cols.astype(jnp.int32).astype(jnp.uint32)

    acc = jnp.zeros((t, out_len), jnp.uint32)
    for j in range(n):
        bj = jax.lax.slice_in_dim(b_u32, j, j + 1, axis=1)  # (T, 1)
        prod = a_u32 * bj  # (T, n) exact u32
        lo = prod & dv.LIMB_MASK
        hi = prod >> dv.LIMB_BITS
        lo_w = min(n, out_len - j)
        hi_w = min(n, out_len - j - 1)
        if lo_w > 0:
            acc = acc + shifted(lo, j, lo_w)
        if hi_w > 0:
            acc = acc + shifted(hi, j + 1, hi_w)
    return acc


def _ks_prefix_local(G, P):
    """Inclusive Kogge-Stone scan of the carry combine over the last axis.

    Manual unrolled form: lax.associative_scan emits zero-width slices that
    Mosaic rejects, and i1 (bool) vectors hit layout-cast bugs — so G/P are
    0/1 uint32 and the combine is bitwise.  Identity element is
    (generate=0, propagate=1), which is what shifted-in lanes are filled
    with.  log2(L) rounds of pure vector logic.
    """
    L = G.shape[-1]
    s = 1
    while s < L:
        keep = jax.lax.slice_in_dim(G, 0, L - s, axis=-1)
        keep_p = jax.lax.slice_in_dim(P, 0, L - s, axis=-1)
        fill_g = jnp.zeros_like(jax.lax.slice_in_dim(G, 0, s, axis=-1))
        fill_p = jnp.ones_like(jax.lax.slice_in_dim(P, 0, s, axis=-1))
        Gs = jnp.concatenate([fill_g, keep], axis=-1)
        Ps = jnp.concatenate([fill_p, keep_p], axis=-1)
        G = G | (P & Gs)
        P = P & Ps
        s *= 2
    return G


def _ks_add_digits_local(s, want_carry_out: bool = False):
    """Mosaic-friendly twin of dv._ks_add_digits (same math, u32-only).

    Digit sums s_i < 2^17, so generate = s >> 16 (0/1) and propagate =
    "s == 0xffff" computed arithmetically as ((s+1) >> 16) & 1 & (1 - G).
    The carry-out, when requested, has shape (..., 1).
    """
    L = s.shape[-1]
    G = s >> dv.LIMB_BITS  # 0/1 uint32
    P = (((s + 1) >> dv.LIMB_BITS) & 1) & (1 - G)
    Gc = _ks_prefix_local(G, P)
    cin = jnp.concatenate(
        [
            jnp.zeros_like(jax.lax.slice_in_dim(Gc, 0, 1, axis=-1)),
            jax.lax.slice_in_dim(Gc, 0, L - 1, axis=-1),
        ],
        axis=-1,
    )
    out = (s + cin) & dv.LIMB_MASK
    if want_carry_out:
        return out, jax.lax.slice_in_dim(Gc, L - 1, L, axis=-1)
    return out


def _carry_local(cols, out_len: int):
    """Mosaic-friendly twin of dv._carry (same math)."""
    L = cols.shape[-1]
    if L < out_len:
        cols = jnp.concatenate(
            [cols, jnp.zeros(cols.shape[:-1] + (out_len - L,), cols.dtype)],
            axis=-1,
        )
    else:
        cols = cols[..., :out_len]
    p = cols & dv.LIMB_MASK
    g = cols >> dv.LIMB_BITS
    gs = jnp.concatenate([jnp.zeros_like(g[..., :1]), g[..., :-1]], axis=-1)
    return _ks_add_digits_local(p + gs)


def _sub_limbs_local(a, b, n: int):
    """(a - b, borrow) without captured constants (cf. dv._sub_limbs)."""
    comp = jnp.uint32(dv.LIMB_MASK) - b
    s = a + comp
    one0 = jnp.concatenate(
        [
            jnp.ones(s.shape[:-1] + (1,), jnp.uint32),
            jnp.zeros(s.shape[:-1] + (n - 1,), jnp.uint32),
        ],
        axis=-1,
    )
    limbs, carry = _ks_add_digits_local(s + one0, want_carry_out=True)
    return limbs, 1 - carry  # borrow: (..., 1) uint32 0/1


def _cond_sub_p_local(t, extra, p_row, n: int):
    """Reduce t + extra*2^(16n) < 2p into [0, p).  extra: (..., 1) limbs.

    Bool-free select: ge = (no borrow) OR (extra != 0) as a 0/1 uint32, and
    the output is a multiplicative blend (Mosaic i1-vector workaround).
    """
    diff, borrow = _sub_limbs_local(t, jnp.broadcast_to(p_row, t.shape), n)
    # t + extra*R < 2p and p < R  =>  extra is 0 or 1; bitwise-or suffices
    # (arith.minui/maxui don't lower in Mosaic)
    ge = (1 - borrow) | extra  # (..., 1) 0/1
    return diff * ge + t * (1 - ge)


def _kernel(n: int, a_ref, b_ref, p_ref, np_ref, d2n_ref, dn_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    P = p_ref[:]  # (1, n)
    NP = np_ref[:]
    d2n = d2n_ref[:]
    dn = dn_ref[:]
    t = a.shape[0]
    # T = a*b (2n limbs, carried)
    T = _carry_local(_full_cols_vmem(a, b, n, 2 * n, d2n), 2 * n)
    # m = T_lo * N' mod R
    T_lo = jax.lax.slice_in_dim(T, 0, n, axis=1)
    m = _carry_local(
        _full_cols_vmem(T_lo, jnp.broadcast_to(NP, (t, n)), n, n, dn), n
    )
    # S = T + m*p over 2n+1 limbs; result = S/R, conditionally reduced
    U = _carry_local(
        _full_cols_vmem(m, jnp.broadcast_to(P, (t, n)), n, 2 * n, d2n), 2 * n
    )
    S = _carry_local(T + U, 2 * n + 1)
    t_mid = jax.lax.slice_in_dim(S, n, 2 * n, axis=1)
    extra = jax.lax.slice_in_dim(S, 2 * n, 2 * n + 1, axis=1)  # (t, 1)
    out_ref[:] = _cond_sub_p_local(t_mid, extra, P, n)


@functools.partial(jax.jit, static_argnums=(0,))
def _mont_mul_pallas_2d(spec: dv.FieldSpec, a, b):
    """(B, n) x (B, n) -> (B, n), B a multiple of the tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = a.shape
    tile = _tile_for(n)
    p_row = jnp.asarray(spec.p_limbs)[None, :]
    np_row = jnp.asarray(spec.nprime_limbs)[None, :]
    diag2n = jnp.asarray(dv._diag_matrix(n, 2 * n))
    diagn = jnp.asarray(dv._diag_matrix(n, n))

    def rep(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, n),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32),
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep((1, n)),
            rep((1, n)),
            rep(diag2n.shape),
            rep(diagn.shape),
        ],
        out_specs=pl.BlockSpec(
            (tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(a, b, p_row, np_row, diag2n, diagn)


def mont_mul(spec: dv.FieldSpec, a, b):
    """Drop-in Montgomery product over (..., n) limb planes (TPU pallas).

    Flattens leading dims, pads the row count to a tile multiple, runs the
    fused kernel, and restores the shape.  fields.device.mont_mul routes
    here on TPU backends.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    n = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    a2 = a.reshape(rows, n)
    b2 = b.reshape(rows, n)
    tile = _tile_for(n)
    padded = (rows + tile - 1) // tile * tile
    if padded != rows:
        a2 = jnp.pad(a2, ((0, padded - rows), (0, 0)))
        b2 = jnp.pad(b2, ((0, padded - rows), (0, 0)))
    out = _mont_mul_pallas_2d(spec, a2, b2)
    return out[:rows].reshape(shape)
