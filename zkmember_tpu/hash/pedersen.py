"""Pedersen CRH with twisted-Edwards point compression — native (non-circuit).

Capability parity with `ark-crypto-primitives`' `PedersenCRHCompressor<_,
TECompressor, W>` as exercised by the reference
(/root/reference/src/commitments/pedersen381/common.rs:22-48: WINDOW_SIZE=4,
NUM_WINDOWS=128 for two-to-one and 144 for leaves;
/root/reference/src/commitments/pedersen761/common.rs:23-47: 4x192 windows).

Semantics reproduced:
  * parameters = per-window generator power tables: table[w][j] = 2^j * g_w,
    w < NUM_WINDOWS, j < WINDOW_SIZE, g_w sampled from an RNG;
  * evaluate(bytes): zero-pad input bytes to the window capacity, decompose
    into bits LSB-first per byte, and compute sum over bit positions of
    bit * table_point — one conditional point addition per bit;
  * compress: map the resulting TE point to its affine x-coordinate
    (the TECompressor injective map).

TPU design: hashing is *batched over messages*.  The bit loop is a
`lax.scan` over the flattened generator table (a trace-time constant
stream), whose body is ONE batched conditional TE mixed addition — the VPU
processes the whole leaf batch per step.  Parameters are sampled on host
with the Python bignum curve, then shipped once as Montgomery limb planes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp
from jax import lax

from zkmember_tpu.fields import device as dv
from zkmember_tpu.curves import device as cdv


@dataclass(frozen=True)
class Window:
    """Pedersen window shape (mirrors pedersen::Window consts)."""

    window_size: int
    num_windows: int

    @property
    def capacity_bits(self) -> int:
        return self.window_size * self.num_windows

    @property
    def capacity_bytes(self) -> int:
        return self.capacity_bits // 8


# the three window configurations the reference instantiates
TWO_TO_ONE_WINDOW_381 = Window(4, 128)  # 512 bits  (2 x 32-byte digests)
LEAF_WINDOW_381 = Window(4, 144)  # 576 bits  (72-byte leaf capacity)
WINDOW_761 = Window(4, 192)  # 768 bits  (2 x 48-byte digests / leaves)


class PedersenParams:
    """Sampled generator tables for one (curve, window) configuration.

    Host side keeps affine points as Python-int pairs (for the host hash and
    for embedding into circuits); device side keeps:
      * (capacity_bits, n) Montgomery planes of the per-bit table points
        (bit-major: point for absolute bit k = 2^(k % WINDOW_SIZE) *
        g_(k // WINDOW_SIZE)) — consumed by the R1CS gadget layer;
      * (num_windows, 2^WINDOW_SIZE, n) per-window digit tables
        digit_table[w][v] = [v] g_w — since the reference's window layout is
        exactly powers-of-two multiples of one generator per window
        (pedersen::CRH), the whole window collapses to one scalar multiple.
        The device hash then needs ONE table lookup per window instead of
        WINDOW_SIZE conditional adds (see _hash_kernel).
    """

    def __init__(self, curve, window: Window, rng):
        self.curve = curve  # host TECurve
        self.window = window
        field = curve.field
        pts = []
        gens = []
        for _ in range(window.num_windows):
            g = _sample_group_element(curve, rng)
            gens.append(g)
            for _ in range(window.window_size):
                pts.append(g)
                g = curve.double(g)
        self.table_host = pts  # list of (x, y) host field elements, bit-major
        # device planes (built lazily: BLS and BW6 use different specs)
        spec = _spec_for_modulus(field.p)
        self.spec = spec
        xs = spec.to_mont_host([pt[0].v for pt in pts])
        ys = spec.to_mont_host([pt[1].v for pt in pts])
        self.table_x = jnp.asarray(xs)  # (capacity_bits, n)
        self.table_y = jnp.asarray(ys)
        self.consts = cdv.TEConsts(spec.mont_scalar(curve.a.v), spec.mont_scalar(curve.d.v))
        self.F = dv.FpOps(spec)
        # per-window digit tables: [v] g_w for v in [0, 2^ws)
        T = 1 << window.window_size
        dig_pts = []
        for g in gens:
            acc = curve.identity()
            for _ in range(T):
                dig_pts.append(acc)
                acc = curve.add(acc, g)
        nw = window.num_windows
        dx = spec.to_mont_host([p[0].v for p in dig_pts]).reshape(nw, T, spec.n)
        dy = spec.to_mont_host([p[1].v for p in dig_pts]).reshape(nw, T, spec.n)
        dt = spec.to_mont_host(
            [p[0].v * p[1].v % field.p for p in dig_pts]
        ).reshape(nw, T, spec.n)
        self.digit_x = jnp.asarray(dx)
        self.digit_y = jnp.asarray(dy)
        self.digit_t = jnp.asarray(dt)  # T = x*y (extended coord, Z = 1)


def _spec_for_modulus(p: int) -> dv.FieldSpec:
    for spec in (dv.BLS_FR, dv.BLS_FQ, dv.BW6_FR, dv.BW6_FQ):
        if spec.p == p:
            return spec
    raise ValueError(f"no device field spec for modulus of {p.bit_length()} bits")


def _sample_group_element(curve, rng) -> tuple:
    """Uniform-ish prime-order-subgroup point: random scalar times generator.

    The reference samples params from `ark_std::test_rng()`
    (/root/reference/src/commitments/pedersen381/mod.rs:24-25); our RNG
    stream is the framework's own deterministic stream (utils.rng).
    """
    while True:
        k = rng.randrange(1, curve.order if curve.order else curve.field.p)
        g = curve.mul(k, curve.generator)
        if not curve.is_identity(g):
            return g


def bytes_to_bits(data: bytes, nbits: int) -> np.ndarray:
    """LSB-first-per-byte bit decomposition, zero-padded to nbits."""
    assert len(data) * 8 <= nbits
    out = np.zeros(nbits, dtype=np.uint32)
    for i, byte in enumerate(data):
        for j in range(8):
            out[8 * i + j] = (byte >> j) & 1
    return out


# ---------------------------------------------------------------------------
# host evaluation (oracle / small inputs)
# ---------------------------------------------------------------------------


def hash_bytes_host(params: PedersenParams, data: bytes):
    """Host Pedersen hash -> compressed digest (host field element)."""
    cap = params.window.capacity_bits
    if len(data) > params.window.capacity_bytes:
        raise ValueError(
            f"input of {len(data)} bytes exceeds window capacity "
            f"{params.window.capacity_bytes}"
        )
    bits = bytes_to_bits(data, cap)
    curve = params.curve
    acc = curve.identity()
    for k in range(cap):
        if bits[k]:
            acc = curve.add(acc, params.table_host[k])
    return acc[0]  # TECompressor: affine x-coordinate


def two_to_one_host(params: PedersenParams, left: bytes, right: bytes):
    """TwoToOneCRH::evaluate — concatenated child digests, same window eval."""
    return hash_bytes_host(params, left + right)


# ---------------------------------------------------------------------------
# device evaluation (batched)
# ---------------------------------------------------------------------------


from functools import partial

import jax


@partial(jax.jit, static_argnums=(0, 1))
def _hash_kernel(F, window_size: int, a_mont, d_mont, dig_x, dig_y, dig_t, bits):
    """Batched Pedersen hash core: (B, nbits) bits + (nw, 2^ws, n) per-window
    digit tables -> canonical (B, n) digest limbs.

    Module-level jit with the tables as ARGUMENTS (not closed-over
    constants): the compiled program is keyed only by (field, window shape,
    batch), so leaf/node params over the same window share one program and
    the persistent compile cache stays valid across parameter resamplings.

    Pipeline (replaces the old 1-conditional-add-per-BIT scan, whose
    capacity_bits sequential waves made leaf hashing latency-bound):
      1. bits -> per-window digits (LSB-first within a window, matching
         pedersen::CRH's table[w][j] = 2^j g_w layout, so the window's
         contribution is just [digit] g_w);
      2. ONE exact-f32 one-hot MXU contraction looks up all (B, nw) table
         points at once;
      3. log2(nw) rounds of batched unified TE additions tree-reduce the
         window axis.
    """
    spec = F.spec
    B, cap = bits.shape
    nw, T = dig_x.shape[0], dig_x.shape[1]
    assert cap == nw * window_size
    weights = (1 << jnp.arange(window_size, dtype=jnp.uint32))
    digits = (bits.reshape(B, nw, window_size) * weights).sum(-1)  # (B, nw)

    oh = jax.nn.one_hot(digits, T, dtype=jnp.float32)  # (B, nw, T)

    def look(tbl):
        # (B, nw, T) . (nw, T, n) -> (B, nw, n); exact: one 1.0 per row and
        # every table limb < 2^16 < 2^24.
        cols = jnp.einsum(
            "bwt,wtn->bwn",
            oh,
            tbl.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        return cols.astype(jnp.uint32)

    X, Y, Tc = look(dig_x), look(dig_y), look(dig_t)
    Z = F.ones((B, nw))

    # pad the window axis to a power of two with the TE identity (0,1,0,1)
    L = 1 << (nw - 1).bit_length()
    if L != nw:
        pad = [(0, 0), (0, L - nw), (0, 0)]
        X = jnp.pad(X, pad)
        Tc = jnp.pad(Tc, pad)
        one_col = jnp.broadcast_to(
            jnp.asarray(spec.one_mont), (B, L - nw, spec.n)
        )
        Y = jnp.concatenate([Y, one_col], axis=1)
        Z = jnp.concatenate([Z, one_col], axis=1)

    C = cdv.TEConsts(a_mont, d_mont)
    P = (X, Y, Tc, Z)
    while L > 1:
        e = tuple(c[:, 0::2] for c in P)
        o = tuple(c[:, 1::2] for c in P)
        P = cdv.te_add(F, C, e, o)
        L //= 2
    acc = tuple(c[:, 0] for c in P)
    x_aff, _ = cdv.te_to_affine(F, acc)
    return dv.from_mont(spec, x_aff)


def hash_bits_device(params: PedersenParams, bits):
    """Batched Pedersen hash of (B, capacity_bits) 0/1 uint32 bit arrays.

    Returns digests as canonical (B, n) uint32 limb arrays (x-coordinates).
    """
    return _hash_kernel(
        params.F,
        params.window.window_size,
        jnp.asarray(params.consts.a),
        jnp.asarray(params.consts.d),
        params.digit_x,
        params.digit_y,
        params.digit_t,
        bits,
    )


_HASH_TILE: int | None = None


def hash_tile() -> int:
    """Canonical hash-batch tile (compile once per params; see msm.tile)."""
    global _HASH_TILE
    if _HASH_TILE is None:
        import jax

        env = os.environ.get("ZKMEMBER_HASH_TILE")
        if env:
            _HASH_TILE = int(env)
        else:
            _HASH_TILE = 512 if jax.default_backend() == "tpu" else 8
    return _HASH_TILE


def hash_bits_tiled(params: PedersenParams, bits_np: np.ndarray) -> np.ndarray:
    """Hash (B, capacity_bits) host bit rows at the canonical tile shape.

    Pads/chunks so ONE compiled program serves every batch size (Merkle
    levels halve each round; per-shape recompiles dominated tree build on
    the remote-compile axon backend).  Returns (B, n) canonical numpy limbs.
    """
    B = bits_np.shape[0]
    T = hash_tile()
    outs = []
    for s in range(0, B, T):
        e = min(s + T, B)
        buf = np.zeros((T, bits_np.shape[1]), np.uint32)
        buf[: e - s] = bits_np[s:e]
        outs.append(np.asarray(hash_bits_device(params, jnp.asarray(buf)))[: e - s])
    return np.concatenate(outs, axis=0)


def digests_to_bits_device(spec: dv.FieldSpec, digests, nbits: int):
    """Canonical (B, n) limb digests -> (B, nbits) bit planes on device.

    Bit order matches bytes_to_bits over the little-endian byte encoding:
    plain little-endian bit order of the integer value, zero-padded.
    """
    n = spec.n
    want_limbs = (nbits + dv.LIMB_BITS - 1) // dv.LIMB_BITS
    d = digests
    if want_limbs > n:
        pad = [(0, 0)] * (d.ndim - 1) + [(0, want_limbs - n)]
        d = jnp.pad(d, pad)
    shifts = jnp.arange(dv.LIMB_BITS, dtype=jnp.uint32)
    # (B, limbs, 16) -> (B, limbs*16)
    bits = (d[..., :want_limbs, None] >> shifts) & 1
    bits = bits.reshape(d.shape[:-1] + (want_limbs * dv.LIMB_BITS,))
    return bits[..., :nbits].astype(jnp.uint32)


def limbs_to_bits_np(limbs: np.ndarray, nbits: int) -> np.ndarray:
    """(B, n) canonical u32 16-bit-limb rows -> (B, nbits) host bit planes
    (little-endian bit order of the integer value, zero-padded)."""
    limbs = np.asarray(limbs)
    want = (nbits + dv.LIMB_BITS - 1) // dv.LIMB_BITS
    if want > limbs.shape[-1]:
        limbs = np.pad(limbs, [(0, 0)] * (limbs.ndim - 1) + [(0, want - limbs.shape[-1])])
    shifts = np.arange(dv.LIMB_BITS, dtype=np.uint32)
    bits = (limbs[..., :want, None] >> shifts) & 1
    return bits.reshape(limbs.shape[:-1] + (want * dv.LIMB_BITS,))[..., :nbits].astype(
        np.uint32
    )


def two_to_one_tiled(
    params: PedersenParams, left_limbs: np.ndarray, right_limbs: np.ndarray
) -> np.ndarray:
    """Tiled TwoToOne hash over canonical numpy limb digests (tree levels)."""
    half = params.window.capacity_bits // 2
    bits = np.concatenate(
        [limbs_to_bits_np(left_limbs, half), limbs_to_bits_np(right_limbs, half)],
        axis=-1,
    )
    return hash_bits_tiled(params, bits)


def two_to_one_device(params: PedersenParams, left_digests, right_digests):
    """Batched TwoToOne hash of canonical limb digests (the tree hot loop).

    Digest byte width is the field's full limb width (32B for BLS stack,
    48B for BW6) — exactly half the window capacity, as in the reference.
    """
    half = params.window.capacity_bits // 2
    lb = digests_to_bits_device(params.spec, left_digests, half)
    rb = digests_to_bits_device(params.spec, right_digests, half)
    return hash_bits_device(params, jnp.concatenate([lb, rb], axis=-1))
