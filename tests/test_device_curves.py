"""Device curve kernels (Jacobian SW, extended TE) vs the host curve oracle.

Covers the group-law surface the reference consumes from ark-ec (SURVEY.md
section 2.2 row 2): batched add/double/scalar-mul/MSM on BLS12-381 G1/G2 and
Jubjub, cross-checked against the Python bignum implementations.
"""

import random
from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv
from zkmember_tpu.curves import device as cdv
from zkmember_tpu.curves import bls12_381 as bls
from zkmember_tpu.curves import jubjub


FQ = dv.FpOps(dv.BLS_FQ)
FQ2 = dv.Fp2Ops(dv.BLS_FQ2)
FR_OPS = dv.FpOps(dv.BLS_FR)


def host_g1_points(rng, k):
    return [bls.G1.mul(rng.randrange(1, bls.R), bls.G1_GEN) for _ in range(k)]


def g1_to_device(pts):
    """Host affine points -> batched Jacobian mont limb arrays (Z=1)."""
    spec = dv.BLS_FQ
    xs = spec.to_mont_host([p[0].v for p in pts])
    ys = spec.to_mont_host([p[1].v for p in pts])
    ones = np.broadcast_to(spec.one_mont, xs.shape).copy()
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ones))


def device_to_g1(P):
    spec = dv.BLS_FQ
    x, y, inf = jax.jit(lambda P: cdv.sw_to_affine(FQ, P))(P)
    xs = spec.from_mont_host(np.asarray(x))
    ys = spec.from_mont_host(np.asarray(y))
    infs = np.asarray(inf)
    out = []
    for xi, yi, ii in zip(np.atleast_1d(xs), np.atleast_1d(ys), np.atleast_1d(infs)):
        out.append(None if ii else (bls.Fq(int(xi)), bls.Fq(int(yi))))
    return out


def scalars_to_bits(scalars, nbits):
    """MSB-first bit matrix (B, nbits) uint32."""
    out = np.zeros((len(scalars), nbits), dtype=np.uint32)
    for i, s in enumerate(scalars):
        for j in range(nbits):
            out[i, j] = (s >> (nbits - 1 - j)) & 1
    return out


@pytest.fixture(scope="module")
def rng():
    return random.Random(999)


def test_sw_add_double_vs_host(rng):
    k = 8
    A = host_g1_points(rng, k)
    B = host_g1_points(rng, k)
    dA, dB = g1_to_device(A), g1_to_device(B)

    got = device_to_g1(jax.jit(lambda P, Q: cdv.sw_add(FQ, P, Q))(dA, dB))
    want = [bls.G1.add(p, q) for p, q in zip(A, B)]
    assert got == want

    got = device_to_g1(jax.jit(lambda P: cdv.sw_double(FQ, P))(dA))
    want = [bls.G1.double(p) for p in A]
    assert got == want


def test_sw_add_special_cases(rng):
    P = host_g1_points(rng, 1)[0]
    negP = bls.G1.neg(P)
    batch = [P, P, P, negP]
    other = [P, negP, P, P]  # P+P (double), P-P (inf), dup, -P+P (inf)
    dP, dQ = g1_to_device(batch), g1_to_device(other)
    got = device_to_g1(jax.jit(lambda P, Q: cdv.sw_add(FQ, P, Q))(dP, dQ))
    assert got[0] == bls.G1.double(P)
    assert got[1] is None
    assert got[3] is None

    # infinity operands
    inf3 = cdv.sw_infinity(FQ, (2,))
    dP2 = g1_to_device([P, P])
    got = device_to_g1(jax.jit(lambda a, b: cdv.sw_add(FQ, a, b))(inf3, dP2))
    assert got == [P, P]
    got = device_to_g1(jax.jit(lambda a, b: cdv.sw_add(FQ, a, b))(dP2, inf3))
    assert got == [P, P]


def test_sw_scalar_mul_and_msm(rng):
    k = 8
    pts = host_g1_points(rng, k)
    scalars = [rng.randrange(bls.R) for _ in range(k - 2)] + [0, 1]
    bits = jnp.asarray(scalars_to_bits(scalars, 255))
    dP = g1_to_device(pts)

    got = device_to_g1(jax.jit(lambda b, P: cdv.sw_scalar_mul(FQ, b, P))(bits, dP))
    want = [bls.G1.mul(s, p) for s, p in zip(scalars, pts)]
    assert got == want

    total = jax.jit(lambda b, P: cdv.sw_msm(FQ, b, P))(bits, dP)
    got = device_to_g1(tuple(c[None] for c in total))[0]
    want_total = None
    for w in want:
        want_total = bls.G1.add(want_total, w)
    assert got == want_total


def test_sw_scalar_mul_windowed(rng):
    import zkmember_tpu.msm.msm as msmmod

    k = 4
    pts = host_g1_points(rng, k)
    scalars = [rng.randrange(bls.R) for _ in range(k - 2)] + [0, 1]
    digits = jnp.asarray(msmmod.scalars_to_digits_np(scalars, 256))
    dP = g1_to_device(pts)
    got = device_to_g1(
        jax.jit(lambda d, P: cdv.sw_scalar_mul_windowed(FQ, d, P))(digits, dP)
    )
    assert got == [bls.G1.mul(s, p) for s, p in zip(scalars, pts)]


def test_sw_msm_bool(rng):
    k = 7  # non-power-of-two exercises the padded tree reduction
    pts = host_g1_points(rng, k)
    mask = jnp.asarray(np.array([1, 0, 1, 1, 0, 1, 0], np.uint32))
    dP = g1_to_device(pts)
    total = jax.jit(lambda m, P: cdv.sw_msm_bool(FQ, m, P))(mask, dP)
    got = device_to_g1(tuple(c[None] for c in total))[0]
    want = None
    for b, p in zip([1, 0, 1, 1, 0, 1, 0], pts):
        if b:
            want = bls.G1.add(want, p)
    assert got == want


def test_g2_ops_vs_host(rng):
    spec = dv.BLS_FQ
    k = 4
    pts = [bls.G2.mul(rng.randrange(1, bls.R), bls.G2_GEN) for _ in range(k)]

    def fq2_dev(vals):  # list of Fq2 host elems -> device pair
        c0 = spec.to_mont_host([v.coeffs[0].v for v in vals])
        c1 = spec.to_mont_host([v.coeffs[1].v for v in vals])
        return (jnp.asarray(c0), jnp.asarray(c1))

    X = fq2_dev([p[0] for p in pts])
    Y = fq2_dev([p[1] for p in pts])
    Z = FQ2.ones((k,))
    P = (X, Y, Z)
    D = jax.jit(lambda P: cdv.sw_double(FQ2, P))(P)
    x, y, inf = jax.jit(lambda P: cdv.sw_to_affine(FQ2, P))(D)
    got_x0 = spec.from_mont_host(np.asarray(x[0]))
    got_x1 = spec.from_mont_host(np.asarray(x[1]))
    want = [bls.G2.double(p) for p in pts]
    assert got_x0 == [w[0].coeffs[0].v for w in want]
    assert got_x1 == [w[0].coeffs[1].v for w in want]
    assert not np.asarray(inf).any()


def test_te_ops_vs_host(rng):
    spec = dv.BLS_FR
    F = FR_OPS
    curve = jubjub.CURVE
    consts = cdv.TEConsts(spec.mont_scalar(curve.a.v), spec.mont_scalar(curve.d.v))
    k = 6
    pts = [curve.mul(rng.randrange(1, curve.order), curve.generator) for _ in range(k)]
    qts = [curve.mul(rng.randrange(1, curve.order), curve.generator) for _ in range(k)]

    def te_dev(ps):
        xs = spec.to_mont_host([p[0].v for p in ps])
        ys = spec.to_mont_host([p[1].v for p in ps])
        ts = spec.to_mont_host([(p[0] * p[1]).v for p in ps])
        zs = np.broadcast_to(spec.one_mont, xs.shape).copy()
        return tuple(jnp.asarray(c) for c in (xs, ys, ts, zs))

    P, Q = te_dev(pts), te_dev(qts)
    S = jax.jit(lambda P, Q: cdv.te_add(F, consts, P, Q))(P, Q)
    x, y = jax.jit(lambda S: cdv.te_to_affine(F, S))(S)
    want = [curve.add(p, q) for p, q in zip(pts, qts)]
    assert spec.from_mont_host(np.asarray(x)) == [w[0].v for w in want]
    assert spec.from_mont_host(np.asarray(y)) == [w[1].v for w in want]

    # identity + doubling via unified law
    S = jax.jit(lambda P, Q: cdv.te_add(F, consts, P, Q))(P, P)
    x, y = jax.jit(lambda S: cdv.te_to_affine(F, S))(S)
    want = [curve.double(p) for p in pts]
    assert spec.from_mont_host(np.asarray(x)) == [w[0].v for w in want]

    # conditional affine-constant add (the Pedersen inner step)
    qx = jnp.asarray(spec.mont_scalar(qts[0][0].v))
    qy = jnp.asarray(spec.mont_scalar(qts[0][1].v))
    bit = jnp.asarray(np.array([1, 0, 1, 0, 1, 0], np.uint32))
    S = jax.jit(lambda P, b: cdv.te_cond_add_affine(F, consts, P, qx, qy, b))(P, bit)
    x, y = jax.jit(lambda S: cdv.te_to_affine(F, S))(S)
    want = [curve.add(p, qts[0]) if b else p for p, b in zip(pts, [1, 0, 1, 0, 1, 0])]
    assert spec.from_mont_host(np.asarray(x)) == [w[0].v for w in want]
    assert spec.from_mont_host(np.asarray(y)) == [w[1].v for w in want]


def test_te_scalar_mul(rng):
    spec = dv.BLS_FR
    curve = jubjub.CURVE
    consts = cdv.TEConsts(spec.mont_scalar(curve.a.v), spec.mont_scalar(curve.d.v))
    pts = [curve.generator, curve.double(curve.generator)]
    scalars = [rng.randrange(curve.order), 1]
    bits = jnp.asarray(scalars_to_bits(scalars, 252))

    def te_dev(ps):
        xs = spec.to_mont_host([p[0].v for p in ps])
        ys = spec.to_mont_host([p[1].v for p in ps])
        ts = spec.to_mont_host([(p[0] * p[1]).v for p in ps])
        zs = np.broadcast_to(spec.one_mont, xs.shape).copy()
        return tuple(jnp.asarray(c) for c in (xs, ys, ts, zs))

    P = te_dev(pts)
    S = jax.jit(lambda b, P: cdv.te_scalar_mul(FR_OPS, consts, b, P))(bits, P)
    x, y = jax.jit(lambda S: cdv.te_to_affine(FR_OPS, S))(S)
    want = [curve.mul(s, p) for s, p in zip(scalars, pts)]
    assert spec.from_mont_host(np.asarray(x)) == [w[0].v for w in want]
    assert spec.from_mont_host(np.asarray(y)) == [w[1].v for w in want]
