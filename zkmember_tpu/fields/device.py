"""Device (TPU) prime-field arithmetic: 16-bit-limb Montgomery planes in JAX.

This is the compute foundation of the whole framework — the TPU-native
replacement for the `ark-ff` 256/384/768-bit Montgomery arithmetic the
reference consumes (SURVEY.md section 2.2 row 1; reference use sites
/root/reference/src/commitments/pedersen381/common.rs:17,
/root/reference/src/commitments/pedersen761/common.rs:17).

Design (TPU-first, not a port):
  * A batch of field elements is a ``uint32`` array of shape ``(..., n)``
    holding ``n`` little-endian 16-bit limbs.  The batch dimensions map onto
    the VPU's (sublane, lane) grid; every op below is elementwise across the
    batch, so XLA vectorizes them with zero layout tricks.
  * 16x16-bit limb products fit *exactly* in uint32 ((2^16-1)^2 < 2^32), and
    column accumulations of lo/hi halves stay < 2^23 even for the 48-limb
    BW6-761 base field, so no 64-bit integers are needed anywhere — int64 is
    emulated on TPU and would halve throughput.
  * Multiplication is Montgomery with *separated* full products
    (T = a*b; m = T_lo * N' mod R; t = (T + m*N)/R) instead of the
    interleaved CIOS loop: 3 schoolbook passes, each a static unrolled loop
    of vectorized multiply-accumulates, with only O(n) cheap sequential
    carry chains.  This trades ~1.5x more multiplies for full batch
    parallelism — the right trade on a vector machine.
  * All loops are unrolled at trace time (n <= 48), so a mont_mul is ~1k
    XLA primitives that fuse into a handful of VPU kernels.

Elements are kept in Montgomery form (x*R mod p, R = 2^(16 n)) on device;
conversion helpers live at the host boundary.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


# ---------------------------------------------------------------------------
# host-side limb conversion helpers (numpy; used at the host/device boundary)
# ---------------------------------------------------------------------------


def int_to_limbs(v: int, n: int) -> np.ndarray:
    """Little-endian 16-bit limb decomposition of a non-negative int."""
    assert 0 <= v < (1 << (LIMB_BITS * n)), (v, n)
    return np.array(
        [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)], dtype=np.uint32
    )


def limbs_to_int(a) -> int:
    a = np.asarray(a)
    assert a.ndim == 1
    return sum(int(x) << (LIMB_BITS * i) for i, x in enumerate(a))


def ints_to_limbs(vals, n: int) -> np.ndarray:
    """(B,) python ints -> (B, n) uint32 limb array."""
    out = np.empty((len(vals), n), dtype=np.uint32)
    for i, v in enumerate(vals):
        out[i] = int_to_limbs(v, n)
    return out


def limbs_to_ints(a) -> list[int]:
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    return [limbs_to_int(row) for row in flat]


# ---------------------------------------------------------------------------
# field specification
# ---------------------------------------------------------------------------


class FieldSpec:
    """Static per-modulus data; appears only as trace-time constants.

    Hashable/comparable by modulus so it can be used as a static jit arg.
    """

    def __init__(self, p: int, n_limbs: int, name: str):
        assert p % 2 == 1
        R = 1 << (LIMB_BITS * n_limbs)
        assert p < R, "modulus must fit the limb budget"
        self.p = p
        self.n = n_limbs
        self.name = name
        self.R = R % p
        self.R2 = (R % p) * (R % p) % p
        self.nprime = (-pow(p, -1, R)) % R  # -p^{-1} mod 2^(16n)
        # trace-time constant limb arrays
        self.p_limbs = int_to_limbs(p, n_limbs)
        self.nprime_limbs = int_to_limbs(self.nprime, n_limbs)
        self.r2_limbs = int_to_limbs(self.R2, n_limbs)
        self.one_mont = int_to_limbs(self.R % p, n_limbs)  # 1 in Montgomery form
        # exponent bits of p-2 (MSB first) for Fermat inversion
        e = p - 2
        self.inv_exp_bits = np.array(
            [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.uint32
        )
        # (p+1)/4 bits for sqrt when p % 4 == 3 (not used by 1 mod 4 fields)
        self.p_mod_4 = p % 4

    def __hash__(self):
        return hash((self.p, self.n))

    def __eq__(self, other):
        return isinstance(other, FieldSpec) and (self.p, self.n) == (other.p, other.n)

    def __repr__(self):
        return f"FieldSpec({self.name}, {self.p.bit_length()}b, {self.n} limbs)"

    # -- host <-> device conversion (canonical <-> Montgomery) --------------
    def to_mont_host(self, vals) -> np.ndarray:
        """Python ints -> (B, n) Montgomery-form limbs (host bignum math)."""
        return ints_to_limbs([v % self.p * self.R % self.p for v in vals], self.n)

    def from_mont_host(self, a) -> list[int]:
        rinv = pow(self.R, -1, self.p)
        return [v * rinv % self.p for v in limbs_to_ints(a)]

    def mont_scalar(self, v: int) -> np.ndarray:
        """Single constant in Montgomery form, shape (n,)."""
        return int_to_limbs(v % self.p * self.R % self.p, self.n)


# ---------------------------------------------------------------------------
# core limb kernels (jnp; all loops static / unrolled)
# ---------------------------------------------------------------------------


_DIAG_MATRICES: dict = {}


def _diag_matrix(n: int, out_len: int) -> np.ndarray:
    """Constant 0/1 f32 matrix summing product terms into output columns.

    Row index = flattened (half, i, j) where half 0 is the low 16 bits of
    a_i*b_j (lands in column i+j) and half 1 the high bits (column i+j+1).
    Shape (2*n*n, out_len).  Used as the weights of a single batched matmul:
    all entries involved are < 2^16 and column sums < 2n*2^16 < 2^23, so the
    f32 MXU computation is exact (f32 integers are exact below 2^24).
    """
    key = (n, out_len)
    if key not in _DIAG_MATRICES:
        M = np.zeros((2, n, n, out_len), np.float32)
        for i in range(n):
            for j in range(n):
                if i + j < out_len:
                    M[0, i, j, i + j] = 1.0
                if i + j + 1 < out_len:
                    M[1, i, j, i + j + 1] = 1.0
        _DIAG_MATRICES[key] = M.reshape(2 * n * n, out_len)
    return _DIAG_MATRICES[key]


def _full_mul_columns(a, b, n: int, out_len: int):
    """Schoolbook product columns of two 16-bit-limb numbers.

    a, b: (..., n) uint32 with limbs < 2^16.  Returns (..., out_len) uint32
    column sums (NOT carry-propagated); every column < 2n * 2^16 < 2^23.
    Truncating out_len below 2n computes the product mod 2^(16*out_len).

    TPU mapping: ONE u32 broadcast multiply (exact: products < 2^32), a
    lo/hi split, then ONE exact-f32 matmul against a constant 0/1 matrix
    that routes each term to its output column — the anti-diagonal sums run
    on the MXU instead of a chain of vector adds, and the trace stays O(1)
    in the limb count.
    """
    batch = a.shape[:-1]
    prod = a[..., :, None] * b[..., None, :]  # (..., n, n) exact u32
    lo = (prod & LIMB_MASK).astype(jnp.float32)
    hi = (prod >> LIMB_BITS).astype(jnp.float32)
    terms = jnp.concatenate(
        [lo.reshape(batch + (n * n,)), hi.reshape(batch + (n * n,))], axis=-1
    )
    M = jnp.asarray(_diag_matrix(n, out_len))
    cols = jax.lax.dot_general(
        terms,
        M,
        dimension_numbers=(((terms.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return cols.astype(jnp.uint32)


def _ks_carry_op(a, b):
    """Kogge-Stone combine for (generate, propagate) carry flags.

    a = earlier-limb prefix state, b = later element; both (G, P) bool.
    """
    ga, pa = a
    gb, pb = b
    return (jnp.logical_or(gb, jnp.logical_and(pb, ga)), jnp.logical_and(pb, pa))


def _ks_add_digits(s, want_carry_out: bool = False):
    """Exact carry propagation of digit sums s_i < 2^17 into 16-bit limbs.

    Log-depth (Kogge-Stone over generate/propagate flags via
    lax.associative_scan) instead of a sequential ripple scan — the carry
    chain is on the critical path of EVERY field op, so depth here sets the
    sequential-op budget of the whole prover.  Exact because each s_i + 1 <
    2^17, so carries are 0/1 and generate/propagate are well-defined.
    """
    from zkmember_tpu.fields import lm as _lm

    if _lm._compact_graphs():
        # sequential ripple scan: ~15 traced ops vs ~240 for Kogge-Stone;
        # selected on the CPU backend where XLA compile time of the carry
        # graphs dominates suite/dryrun wall clock (see lm.ks_add_digits)
        s_t = jnp.moveaxis(s, -1, 0)  # (L, ...)
        c0 = jnp.zeros(s.shape[:-1], jnp.uint32)

        def body(c, row):
            t = row + c
            return t >> LIMB_BITS, t & LIMB_MASK

        cout, rows = lax.scan(body, c0, s_t)
        out = jnp.moveaxis(rows, 0, -1)
        if want_carry_out:
            return out, cout
        return out
    G = s > LIMB_MASK
    P = s == LIMB_MASK
    Gc, _ = lax.associative_scan(_ks_carry_op, (G, P), axis=-1)
    cin = jnp.pad(
        Gc[..., :-1], [(0, 0)] * (s.ndim - 1) + [(1, 0)]
    )
    out = (s + cin.astype(jnp.uint32)) & LIMB_MASK
    if want_carry_out:
        return out, Gc[..., -1].astype(jnp.uint32)
    return out


def _carry(cols, out_len: int):
    """Carry propagation: columns (< 2^23) -> 16-bit limbs, log depth.

    Returns (..., out_len) uint32 with all limbs < 2^16.  Carries beyond
    out_len are dropped (callers size out_len so this is exact or wraps
    mod 2^(16*out_len) intentionally).  Two steps: (1) local split of each
    column into a 16-bit digit + a < 2^7 carry into the next column, giving
    digit sums < 2^16 + 2^7; (2) one Kogge-Stone 0/1-carry addition.
    """
    L = cols.shape[-1]
    if L < out_len:
        cols = jnp.pad(cols, [(0, 0)] * (cols.ndim - 1) + [(0, out_len - L)])
    else:
        cols = cols[..., :out_len]
    p = cols & LIMB_MASK
    g = cols >> LIMB_BITS  # < 2^7 for column sums < 2^23
    gs = jnp.pad(g[..., :-1], [(0, 0)] * (cols.ndim - 1) + [(1, 0)])
    return _ks_add_digits(p + gs)


def _sub_limbs(a, b, n: int):
    """(a - b) over n 16-bit limbs; returns (diff_limbs, borrow), borrow=1
    iff a < b.  Complement addition a + (~b) + 1 with the same log-depth
    Kogge-Stone carry as _carry; borrow = 1 - carry_out.
    """
    comp = jnp.uint32(LIMB_MASK) - b
    s = a + comp
    one0 = np.zeros(n, np.uint32)
    one0[0] = 1
    s = s + jnp.asarray(one0)
    limbs, carry = _ks_add_digits(s, want_carry_out=True)
    return limbs, (1 - carry).astype(jnp.int32)


def _cond_sub_p(spec: FieldSpec, t, extra):
    """Reduce t (n limbs) + extra*2^(16n) < 2p into [0, p): subtract p iff >= p."""
    n = spec.n
    P = jnp.asarray(spec.p_limbs)
    diff, borrow = _sub_limbs(t, jnp.broadcast_to(P, t.shape), n)
    # value >= p  <=>  (borrow == 0) or extra > 0
    ge = jnp.logical_or(borrow == 0, extra > 0)
    return jnp.where(ge[..., None], diff, t)


_PALLAS: bool | None = None


def _use_pallas() -> bool:
    """Route mont_mul through the fused Pallas kernel (fields.pallas_field).

    Opt-in via ZKMEMBER_PALLAS=1: the kernel is bit-exact and keeps the
    whole Montgomery pipeline in VMEM, but on v5e it currently measures at
    parity with the XLA composition (~0.45 ms per 4096x24-limb call either
    way — both are bound by vector-op issue, not HBM) while adding a
    Mosaic compile per shape, so the XLA path stays the default.
    """
    global _PALLAS
    if _PALLAS is None:
        import os

        _PALLAS = bool(os.environ.get("ZKMEMBER_PALLAS"))
    return _PALLAS


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product a*b*R^{-1} mod p over (..., n) uint32 limb arrays."""
    if _use_pallas():
        from zkmember_tpu.fields import pallas_field

        return pallas_field.mont_mul(spec, a, b)
    n = spec.n
    NP = jnp.asarray(spec.nprime_limbs)
    P = jnp.asarray(spec.p_limbs)
    # T = a*b, exact 2n limbs
    T = _carry(_full_mul_columns(a, b, n, 2 * n), 2 * n)
    # m = (T mod R) * N' mod R
    m = _carry(_full_mul_columns(T[..., :n], jnp.broadcast_to(NP, T[..., :n].shape), n, n), n)
    # U = m * p, exact 2n limbs
    U = _carry(_full_mul_columns(m, jnp.broadcast_to(P, m.shape), n, 2 * n), 2 * n)
    # S = T + U; low n limbs are 0 by construction; t = S / R < 2p
    S = _carry(T + U, 2 * n + 1)  # columns < 2^17, top carry captured
    t = S[..., n : 2 * n]
    extra = S[..., 2 * n]
    return _cond_sub_p(spec, t, extra)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def mont_mul_many(spec: FieldSpec, pairs):
    """[a_i * b_i] for k independent products as ONE stacked Montgomery mul.

    The group laws issue 6-12 independent field products per wave; issuing
    them one-by-one leaves the MXU underfed ((B, 2n^2)@(2n^2, 2n) matmuls
    with tiny N) and pays k separate carry-chain op sequences.  Stacking on
    a fresh leading axis turns the wave into a single (k*B)-row matmul and
    one carry pipeline — the difference between ~4 and ~18 effective
    TFLOP/s on the v5e MXU for the MSM inner loop.
    """
    if len(pairs) == 1:
        a, b = pairs[0]
        return [mont_mul(spec, a, b)]
    shape = jnp.broadcast_shapes(*(x.shape for p in pairs for x in p))
    A = jnp.stack([jnp.broadcast_to(a, shape) for a, _ in pairs])
    B = jnp.stack([jnp.broadcast_to(b, shape) for _, b in pairs])
    out = mont_mul(spec, A, B)
    return [out[i] for i in range(len(pairs))]


def add(spec: FieldSpec, a, b):
    """Modular addition over (..., n) limb arrays (any form; form-preserving)."""
    cols = a + b  # < 2^17
    s = _carry(cols, spec.n + 1)
    return _cond_sub_p(spec, s[..., : spec.n], s[..., spec.n])


def sub(spec: FieldSpec, a, b):
    """Modular subtraction: a - b mod p."""
    n = spec.n
    d, borrow = _sub_limbs(a, b, n)
    dp = _carry(d + jnp.asarray(spec.p_limbs), n)  # (a - b + p) mod 2^(16n)
    return jnp.where((borrow == 1)[..., None], dp, d)


def neg(spec: FieldSpec, a):
    return sub(spec, zeros_like(spec, a), a)


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def zeros(spec: FieldSpec, shape=()):
    return jnp.zeros(tuple(shape) + (spec.n,), jnp.uint32)


def zeros_like(spec: FieldSpec, a):
    return jnp.zeros_like(a)


def ones(spec: FieldSpec, shape=()):
    """1 in Montgomery form."""
    return jnp.broadcast_to(jnp.asarray(spec.one_mont), tuple(shape) + (spec.n,))


def is_zero(spec: FieldSpec, a):
    """Boolean mask over batch dims: element == 0 (any form)."""
    return jnp.all(a == 0, axis=-1)


def eq(spec: FieldSpec, a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """Elementwise select over batch dims: mask ? a : b (mask: batch-shaped bool)."""
    return jnp.where(mask[..., None], a, b)


def to_mont(spec: FieldSpec, a):
    """Canonical limbs -> Montgomery form on device."""
    return mont_mul(spec, a, jnp.broadcast_to(jnp.asarray(spec.r2_limbs), a.shape))

def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical limbs on device."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(spec, a, one)


def mont_pow_static(spec: FieldSpec, a, exp_bits: np.ndarray):
    """a^e with a static exponent bit string (MSB first), via lax.scan.

    a is in Montgomery form; result in Montgomery form.
    """
    bits = jnp.asarray(exp_bits.astype(np.uint32))
    acc0 = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape)

    def body(acc, bit):
        acc = mont_mul(spec, acc, acc)
        withmul = mont_mul(spec, acc, a)
        acc = jnp.where(jnp.bool_(bit), withmul, acc)
        return acc, None

    acc, _ = lax.scan(body, acc0, bits)
    return acc


def inv(spec: FieldSpec, a):
    """Batched modular inverse via Fermat (a^(p-2)); inverse of 0 is 0."""
    return mont_pow_static(spec, a, spec.inv_exp_bits)


# ---------------------------------------------------------------------------
# quadratic extension (Fp2 with x^2 = nonresidue) — needed for BLS12-381 G2
# MSMs on device.  Elements are pairs (c0, c1) of base-field limb arrays.
# ---------------------------------------------------------------------------


class Fp2Spec:
    """Quadratic extension over `base` with a small-int nonresidue."""

    def __init__(self, base: FieldSpec, nonresidue: int, name: str):
        self.base = base
        self.nonresidue = nonresidue % base.p
        self.name = name
        self.nr_mont = base.mont_scalar(nonresidue)

    def __hash__(self):
        return hash((self.base, self.nonresidue))

    def __eq__(self, o):
        return (
            isinstance(o, Fp2Spec)
            and self.base == o.base
            and self.nonresidue == o.nonresidue
        )


def _mul_nr(spec: Fp2Spec, v):
    """Multiply a base-field element by the nonresidue; nr = -1 (the
    BLS12-381 Fq2 case) is a free negation instead of a full mont_mul."""
    if spec.nonresidue == spec.base.p - 1:
        return neg(spec.base, v)
    return mont_mul(spec.base, v, jnp.broadcast_to(jnp.asarray(spec.nr_mont), v.shape))


def fp2_mul(spec: Fp2Spec, a, b):
    """Karatsuba Fp2 product (3 base muls): (a0 + a1 x)(b0 + b1 x), x^2 = nr."""
    base = spec.base
    a0, a1 = a
    b0, b1 = b
    v0 = mont_mul(base, a0, b0)
    v1 = mont_mul(base, a1, b1)
    c0 = add(base, v0, _mul_nr(spec, v1))
    t = mont_mul(base, add(base, a0, a1), add(base, b0, b1))
    c1 = sub(base, sub(base, t, v0), v1)
    return (c0, c1)


def fp2_sqr(spec: Fp2Spec, a):
    """Complex squaring (2 base muls): c0 = (a0+a1)(a0+nr*a1) - (1+nr)a0a1,
    c1 = 2 a0 a1.  For nr = -1 this is the classic (a0+a1)(a0-a1) form."""
    base = spec.base
    a0, a1 = a
    v = mont_mul(base, a0, a1)
    if spec.nonresidue == spec.base.p - 1:
        c0 = mont_mul(base, add(base, a0, a1), sub(base, a0, a1))
    else:
        t = mont_mul(base, add(base, a0, a1), add(base, a0, _mul_nr(spec, a1)))
        c0 = sub(base, sub(base, t, v), _mul_nr(spec, v))
    return (c0, add(base, v, v))


def fp2_add(spec: Fp2Spec, a, b):
    return (add(spec.base, a[0], b[0]), add(spec.base, a[1], b[1]))


def fp2_sub(spec: Fp2Spec, a, b):
    return (sub(spec.base, a[0], b[0]), sub(spec.base, a[1], b[1]))


# ---------------------------------------------------------------------------
# generic "field ops" objects so curve code is generic over Fp vs Fp2
# ---------------------------------------------------------------------------


class FpOps:
    """Field-op vtable over base-field limb arrays (elements: (..., n) u32).

    Hash/eq by spec: FpOps appears as a static jit argument all over the
    kernel layer, so two instances over the same field MUST key the same
    compiled program (object-identity hashing caused silent recompiles).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec

    def __hash__(self):
        return hash(("FpOps", self.spec))

    def __eq__(self, other):
        return isinstance(other, FpOps) and self.spec == other.spec

    def mul(self, a, b):
        return mont_mul(self.spec, a, b)

    def mul_many(self, pairs):
        """Batched independent products — see mont_mul_many."""
        return mont_mul_many(self.spec, pairs)

    def sqr(self, a):
        return mont_mul(self.spec, a, a)

    def add(self, a, b):
        return add(self.spec, a, b)

    def sub(self, a, b):
        return sub(self.spec, a, b)

    def neg(self, a):
        return neg(self.spec, a)

    def double(self, a):
        return add(self.spec, a, a)

    def zeros(self, shape=()):
        return zeros(self.spec, shape)

    def ones(self, shape=()):
        return ones(self.spec, shape)

    def is_zero(self, a):
        return is_zero(self.spec, a)

    def eq(self, a, b):
        return eq(self.spec, a, b)

    def select(self, mask, a, b):
        return select(mask, a, b)

    def inv(self, a):
        return inv(self.spec, a)

    def batch_shape(self, a):
        return a.shape[:-1]

    def broadcast_const(self, const_limbs, shape):
        return jnp.broadcast_to(jnp.asarray(const_limbs), tuple(shape) + (self.spec.n,))

    # host conversion for a single int constant -> mont element
    def const(self, v: int):
        return jnp.asarray(self.spec.mont_scalar(v))


class Fp2Ops:
    """Field-op vtable over Fp2 elements (pairs of limb arrays).

    Hash/eq by spec (see FpOps)."""

    def __init__(self, spec: Fp2Spec):
        self.spec = spec
        self.base = FpOps(spec.base)

    def __hash__(self):
        return hash(("Fp2Ops", self.spec))

    def __eq__(self, other):
        return isinstance(other, Fp2Ops) and self.spec == other.spec

    def mul(self, a, b):
        return fp2_mul(self.spec, a, b)

    def mul_many(self, pairs):
        """k independent Fp2 Karatsuba products, fully stacked: ONE
        base-field mul of 3k rows (v0 = a0 b0, v1 = a1 b1, t =
        (a0+a1)(b0+b1)) and ONE stacked recombination — the per-pair
        add/sub dispatches were half the G2 point-add wall time."""
        base = self.spec.base
        k = len(pairs)
        shape = jnp.broadcast_shapes(
            *(c.shape for a, b in pairs for pair in (a, b) for c in pair)
        )

        def stk(items):
            return jnp.stack([jnp.broadcast_to(c, shape) for c in items])

        A0 = stk([a[0] for a, _ in pairs])  # (k, ..., n)
        A1 = stk([a[1] for a, _ in pairs])
        B0 = stk([b[0] for _, b in pairs])
        B1 = stk([b[1] for _, b in pairs])
        SA = add(base, A0, A1)
        SB = add(base, B0, B1)
        big_a = jnp.concatenate([A0, A1, SA])
        big_b = jnp.concatenate([B0, B1, SB])
        prods = mont_mul(base, big_a, big_b)  # (3k, ..., n)
        v0 = prods[:k]
        v1 = prods[k : 2 * k]
        t = prods[2 * k :]
        c0 = add(base, v0, _mul_nr(self.spec, v1))
        c1 = sub(base, sub(base, t, v0), v1)
        return [(c0[i], c1[i]) for i in range(k)]

    def sqr(self, a):
        return fp2_sqr(self.spec, a)

    def add(self, a, b):
        return fp2_add(self.spec, a, b)

    def sub(self, a, b):
        return fp2_sub(self.spec, a, b)

    def neg(self, a):
        return (self.base.neg(a[0]), self.base.neg(a[1]))

    def double(self, a):
        return self.add(a, a)

    def zeros(self, shape=()):
        return (zeros(self.spec.base, shape), zeros(self.spec.base, shape))

    def ones(self, shape=()):
        return (ones(self.spec.base, shape), zeros(self.spec.base, shape))

    def is_zero(self, a):
        return jnp.logical_and(self.base.is_zero(a[0]), self.base.is_zero(a[1]))

    def eq(self, a, b):
        return jnp.logical_and(self.base.eq(a[0], b[0]), self.base.eq(a[1], b[1]))

    def select(self, mask, a, b):
        return (select(mask, a[0], b[0]), select(mask, a[1], b[1]))

    def inv(self, a):
        # (a0 + a1 x)^-1 = (a0 - a1 x) / (a0^2 - nr a1^2)
        base = self.base
        norm = base.sub(base.sqr(a[0]), _mul_nr(self.spec, base.sqr(a[1])))
        ninv = base.inv(norm)
        return (base.mul(a[0], ninv), base.neg(base.mul(a[1], ninv)))

    def batch_shape(self, a):
        return a[0].shape[:-1]


# ---------------------------------------------------------------------------
# concrete specs for the four fields the framework ships
# (moduli imported from the derived host constants — single source of truth)
# ---------------------------------------------------------------------------


def _make_specs():
    from zkmember_tpu.curves import bls12_381, bw6_761

    bls_fr = FieldSpec(bls12_381.R, 16, "BLS12-381 Fr")  # 255-bit, NTT 2-adicity 32
    bls_fq = FieldSpec(bls12_381.Q, 24, "BLS12-381 Fq")  # 381-bit
    bw6_fr = FieldSpec(bw6_761.R, 24, "BW6-761 Fr")  # 377-bit, 2-adicity 46
    bw6_fq = FieldSpec(bw6_761.Q, 48, "BW6-761 Fq")  # 761-bit
    # NTT domain data (consumed by zkmember_tpu.ntt)
    bls_fr.two_adicity = bls12_381.TWO_ADICITY
    bls_fr.two_adic_root = bls12_381.ROOT_OF_UNITY
    bls_fr.mult_gen = bls12_381.FR_MULT_GEN
    bw6_fr.two_adicity = bw6_761.TWO_ADICITY
    bw6_fr.two_adic_root = bw6_761.ROOT_OF_UNITY
    bw6_fr.mult_gen = bw6_761.FR_MULT_GEN
    bls_fq2 = Fp2Spec(bls_fq, -1, "BLS12-381 Fq2")
    return bls_fr, bls_fq, bw6_fr, bw6_fq, bls_fq2


BLS_FR, BLS_FQ, BW6_FR, BW6_FQ, BLS_FQ2 = _make_specs()
