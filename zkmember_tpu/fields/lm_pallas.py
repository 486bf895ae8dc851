"""Pallas TPU kernel: limb-major Montgomery multiplication in VMEM.

Round-5 roofline fix.  The XLA-composed limb-major mont_mul (fields.lm)
materializes every schoolbook pass's (2n+1, B) accumulator to HBM — the
round-5 TPU trace showed the flagship G1x4 proof MSM at 9.2 G u32-mults/s
(0.9 % of VPU peak, ~25 KB of HBM traffic per lane per field mul), making
the whole prover HBM-bound.  This kernel runs the identical 3-pass
separated-operand pipeline (T = a*b; m = T_lo * N' mod R; S = T + m*p;
out = S/R cond-sub p — same math as fields.lm.mont_mul, oracle-tested)
entirely inside VMEM: one HBM read per operand block, one write of the
product, ~300 B/lane total traffic.

Layout matches the prover: elements are (..., n, B) u32 planes with the
limb axis on SUBLANES (n in {16, 24, 48}, all multiples of 8) and the
batch axis on LANES.  The grid tiles (leading dims) x (B / TILE_B); each
program handles an (n, TILE_B) block.  Carries run along the sublane axis
with the same Kogge-Stone combine as the XLA path, written with
concat-shifts and 0/1-uint32 logic (lax.associative_scan and i1 vectors
do not lower in Mosaic).

Dispatch: fields.lm.mont_mul routes here on TPU backends for shapes with
>= MIN_LANES lanes (env ZKMEMBER_PALLAS_LM=0 opts out); everything else
keeps the XLA path.  CPU tests exercise the kernel via interpret mode in
tests/test_pallas_field.py-style oracle checks.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from zkmember_tpu.fields.device import LIMB_BITS, LIMB_MASK, FieldSpec


MIN_LANES = 1 << 11  # below this the XLA path wins (kernel launch overhead)


def _tile_b(n: int) -> int:
    env = os.environ.get("ZKMEMBER_PALLAS_LM_TILE")
    if env:
        return int(env)
    return 2048 if n <= 24 else 1024


def enabled() -> bool:
    if os.environ.get("ZKMEMBER_PALLAS_LM", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# in-kernel helpers: all arrays are (rows, TB) u32, limb axis 0
# ---------------------------------------------------------------------------


def _rows_shifted(x, down: int, out_rows: int):
    """x placed at row offset `down` of an (out_rows, TB) zero block."""
    t = x.shape[1]
    width = min(x.shape[0], out_rows - down)
    parts = []
    if down > 0:
        parts.append(jnp.zeros((down, t), jnp.uint32))
    parts.append(jax.lax.slice_in_dim(x, 0, width, axis=0))
    rest = out_rows - down - width
    if rest > 0:
        parts.append(jnp.zeros((rest, t), jnp.uint32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _full_cols(a, b, n: int, out_len: int):
    """Schoolbook columns of a*b: (out_len, TB) u32 sums < 2n * 2^16."""
    acc = jnp.zeros((out_len, a.shape[1]), jnp.uint32)
    for i in range(n):
        ai = jax.lax.slice_in_dim(a, i, i + 1, axis=0)  # (1, TB)
        p = ai * b  # (n, TB) exact u32 (16x16-bit)
        lo_w = min(n, out_len - i)
        hi_w = min(n, out_len - i - 1)
        if lo_w > 0:
            acc = acc + _rows_shifted(p & LIMB_MASK, i, out_len)
        if hi_w > 0:
            acc = acc + _rows_shifted(p >> LIMB_BITS, i + 1, out_len)
    return acc


def _ks_prefix(G, P):
    """Inclusive Kogge-Stone carry combine along axis 0 (0/1 uint32)."""
    L = G.shape[0]
    s = 1
    while s < L:
        keep_g = jax.lax.slice_in_dim(G, 0, L - s, axis=0)
        keep_p = jax.lax.slice_in_dim(P, 0, L - s, axis=0)
        fill_g = jnp.zeros((s, G.shape[1]), jnp.uint32)
        fill_p = jnp.ones((s, G.shape[1]), jnp.uint32)
        G = G | (P & jnp.concatenate([fill_g, keep_g], axis=0))
        P = P & jnp.concatenate([fill_p, keep_p], axis=0)
        s *= 2
    return G


def _ks_add_digits(s, want_carry_out: bool = False):
    """Digit sums < 2^17 -> normalized 16-bit limbs (axis-0 carries)."""
    L = s.shape[0]
    G = s >> LIMB_BITS
    P = (((s + 1) >> LIMB_BITS) & 1) & (1 - G)
    Gc = _ks_prefix(G, P)
    cin = jnp.concatenate(
        [jnp.zeros((1, s.shape[1]), jnp.uint32),
         jax.lax.slice_in_dim(Gc, 0, L - 1, axis=0)],
        axis=0,
    )
    out = (s + cin) & LIMB_MASK
    if want_carry_out:
        return out, jax.lax.slice_in_dim(Gc, L - 1, L, axis=0)
    return out


def _carry(cols, out_len: int):
    L = cols.shape[0]
    if L < out_len:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_len - L, cols.shape[1]), jnp.uint32)], axis=0
        )
    else:
        cols = jax.lax.slice_in_dim(cols, 0, out_len, axis=0)
    p = cols & LIMB_MASK
    g = cols >> LIMB_BITS
    gs = jnp.concatenate(
        [jnp.zeros((1, cols.shape[1]), jnp.uint32),
         jax.lax.slice_in_dim(g, 0, out_len - 1, axis=0)],
        axis=0,
    )
    return _ks_add_digits(p + gs)


def _sub_limbs(a, b, n: int):
    """(a - b mod 2^16n, borrow (1,TB) 0/1) via complement add."""
    comp = jnp.uint32(LIMB_MASK) - b
    s = a + comp
    one0 = jnp.concatenate(
        [jnp.ones((1, a.shape[1]), jnp.uint32),
         jnp.zeros((n - 1, a.shape[1]), jnp.uint32)],
        axis=0,
    )
    limbs, carry = _ks_add_digits(s + one0, want_carry_out=True)
    return limbs, 1 - carry


def _kernel(n: int, a_ref, b_ref, p_ref, np_ref, out_ref):
    a = a_ref[0]
    b = b_ref[0]
    P = p_ref[:]  # (n, 1) broadcasts over lanes
    NP = np_ref[:]
    T = _carry(_full_cols(a, b, n, 2 * n), 2 * n)
    T_lo = jax.lax.slice_in_dim(T, 0, n, axis=0)
    m = _carry(_full_cols(T_lo, jnp.broadcast_to(NP, (n, a.shape[1])), n, n), n)
    U = _full_cols(m, jnp.broadcast_to(P, (n, a.shape[1])), n, 2 * n)
    S = _carry(T + U, 2 * n + 1)  # low n limbs exactly zero
    t_mid = jax.lax.slice_in_dim(S, n, 2 * n, axis=0)
    extra = jax.lax.slice_in_dim(S, 2 * n, 2 * n + 1, axis=0)  # (1, TB) 0/1
    diff, borrow = _sub_limbs(t_mid, jnp.broadcast_to(P, (n, a.shape[1])), n)
    ge = (1 - borrow) | extra  # (1, TB) 0/1
    out_ref[0] = diff * ge + t_mid * (1 - ge)


@functools.partial(jax.jit, static_argnums=(0,))
def _mont_mul_pallas_3d(spec: FieldSpec, a, b):
    """(K, n, B) x (K, n, B) -> (K, n, B); B a multiple of the tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n, B = a.shape
    tb = min(_tile_b(n), B)
    p_col = jnp.asarray(spec.p_limbs.reshape(n, 1))
    np_col = jnp.asarray(spec.nprime_limbs.reshape(n, 1))

    return pl.pallas_call(
        functools.partial(_kernel, n),
        out_shape=jax.ShapeDtypeStruct((K, n, B), jnp.uint32),
        grid=(K, B // tb),
        in_specs=[
            pl.BlockSpec((1, n, tb), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, tb), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda k, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda k, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, tb), lambda k, j: (k, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(a, b, p_col, np_col)


def fits(shape, n: int) -> bool:
    """True when the pallas path handles this operand shape efficiently."""
    if len(shape) < 2 or shape[-2] != n:
        return False
    B = shape[-1]
    lead = 1
    for d in shape[:-2]:
        lead *= d
    tb = _tile_b(n)
    return B % tb == 0 and lead * B >= MIN_LANES


def mont_mul(spec: FieldSpec, a, b):
    """Drop-in for fields.lm.mont_mul on (..., n, B) planes (TPU only)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    n = spec.n
    a3 = jnp.broadcast_to(a, shape).reshape((-1, n, shape[-1]))
    b3 = jnp.broadcast_to(b, shape).reshape((-1, n, shape[-1]))
    out = _mont_mul_pallas_3d(spec, a3, b3)
    return out.reshape(shape)
