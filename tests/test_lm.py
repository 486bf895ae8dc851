"""Limb-major field core + gather-free Straus MSM correctness.

Oracles: host bignum field/curve modules (tests/test_host_fields_curves
validates those against known vectors)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkmember_tpu.fields import device as dv
from zkmember_tpu.fields import lm
from zkmember_tpu.curves import device as cdv
from zkmember_tpu.curves import bls12_381 as bls
from zkmember_tpu.msm import straus
import zkmember_tpu.msm.msm as msmmod


def _rand_elems(rng, p, b):
    return [rng.randrange(p) for _ in range(b)]


def _to_lm_mont(spec, vals):
    return lm.to_lm(spec.to_mont_host(vals))


def _from_lm_mont(spec, arr):
    return spec.from_mont_host(lm.from_lm(arr))


@pytest.mark.parametrize("spec", [dv.BLS_FR, dv.BLS_FQ, dv.BW6_FQ])
def test_lm_field_ops(spec):
    import random

    rng = random.Random(3)
    p = spec.p
    B = 8
    av = _rand_elems(rng, p, B)
    bv = _rand_elems(rng, p, B)
    A = _to_lm_mont(spec, av)
    Bm = _to_lm_mont(spec, bv)
    got = _from_lm_mont(spec, lm.mont_mul(spec, A, Bm))
    assert got == [a * b % p for a, b in zip(av, bv)]
    got = _from_lm_mont(spec, lm.add(spec, A, Bm))
    assert got == [(a + b) % p for a, b in zip(av, bv)]
    got = _from_lm_mont(spec, lm.sub(spec, A, Bm))
    assert got == [(a - b) % p for a, b in zip(av, bv)]
    got = _from_lm_mont(spec, lm.inv(spec, A))
    assert got == [pow(a, -1, p) for a in av]


def test_lm_carry_pathological():
    """0xFFFF runs must carry exactly (the fixed-round f32 design failed
    here; the Kogge-Stone scan must not)."""
    spec = dv.BLS_FR
    p = spec.p
    # values engineered so a*b has long 0xffff runs in partial sums
    av = [p - 1, (1 << 255) % p, int("ffff" * 15, 16) % p, 1]
    bv = [p - 1, p - 2, int("ffff" * 15, 16) % p, 1]
    A = _to_lm_mont(spec, av)
    Bm = _to_lm_mont(spec, bv)
    got = _from_lm_mont(spec, lm.mont_mul(spec, A, Bm))
    assert got == [a * b % p for a, b in zip(av, bv)]


def _host_msm(curve, pts, scalars):
    acc = None
    for s, pt in zip(scalars, pts):
        if s == 0:
            continue
        term = curve.mul(s, pt)
        acc = term if acc is None else curve.add(acc, term)
    return acc


def _lm_points(spec, pts):
    xs = lm.to_lm(spec.to_mont_host([p[0].v for p in pts]))
    ys = lm.to_lm(spec.to_mont_host([p[1].v for p in pts]))
    return xs, ys


def _lm_ops_g1():
    F = lm.FpOpsLM(dv.BLS_FQ)
    return cdv.sw_ops_for(F, 12, "bls12_381_g1/lm")  # b=4, b3=12


def _lm_ops_g2():
    F = lm.Fp2OpsLM(dv.BLS_FQ2)
    return cdv.sw_ops_for(F, (12, 12), "bls12_381_g2/lm")  # b=4(1+u), b3


def test_lm_g1_add_double():
    import random

    rng = random.Random(5)
    g1 = bls.G1
    pts = [g1.mul(rng.randrange(1, bls.R), bls.G1_GEN) for _ in range(4)]
    qts = [g1.mul(rng.randrange(1, bls.R), bls.G1_GEN) for _ in range(4)]
    ops = _lm_ops_g1()
    X1, Y1 = _lm_points(dv.BLS_FQ, pts)
    X2, Y2 = _lm_points(dv.BLS_FQ, qts)
    P = cdv.swp_from_affine(ops, X1, Y1)
    Q = cdv.swp_from_affine(ops, X2, Y2)
    S = cdv.swp_add(ops, P, Q)
    D = cdv.swp_double(ops, P)
    for i in range(4):
        want = g1.add(pts[i], qts[i])
        got = straus.projective_to_host(
            None, g1, tuple(c[:, i : i + 1] for c in S)
        )
        assert got == want
        want = g1.double(pts[i])
        got = straus.projective_to_host(
            None, g1, tuple(c[:, i : i + 1] for c in D)
        )
        assert got == want


@pytest.mark.parametrize(
    "g2",
    [
        False,
        pytest.param(
            True,
            marks=pytest.mark.skipif(
                not __import__("os").environ.get("RUN_SLOW"),
                reason="Fp2 MSM compile is ~10min on the 2-core CPU box; the "
                "G2 path is covered by test_prove_lm's b2 query (RUN_SLOW=1)",
            ),
        ),
    ],
)
def test_lm_msm_matches_host(g2):
    import random

    rng = random.Random(7)
    B = 16
    r = bls.R
    if g2:
        curve, gen = bls.G2, bls.G2_GEN
        ops = _lm_ops_g2()
    else:
        curve, gen = bls.G1, bls.G1_GEN
        ops = _lm_ops_g1()
    pts = [curve.mul(rng.randrange(1, r), gen) for _ in range(B)]
    # general scalars incl. zeros (zero lanes must vanish via table entry 0)
    scalars = [rng.randrange(r) for _ in range(B - 3)] + [0, 1, 0]
    bool_mask = np.array([rng.randrange(2) for _ in range(B)], np.uint32)

    if g2:
        spec2 = dv.BLS_FQ2
        base = spec2.base

        def comp(i, j):
            return lm.to_lm(base.to_mont_host([p[i].coeffs[j].v for p in pts]))

        X = (comp(0, 0), comp(0, 1))
        Y = (comp(1, 0), comp(1, 1))
    else:
        X, Y = _lm_points(dv.BLS_FQ, pts)

    nl = (r.bit_length() + 15) // 16
    zrows = np.zeros((B, nl), np.uint32)
    for i, s in enumerate(scalars):
        for j in range(nl):
            zrows[i, j] = (s >> (16 * j)) & 0xFFFF
    z = lm.to_lm(zrows)
    nwin = (r.bit_length() + straus.WINDOW_BITS - 1) // straus.WINDOW_BITS
    out = straus.msm_program(ops, X, Y, z, nwin)
    got = straus.projective_to_host(None, curve, out)
    want = _host_msm(curve, pts, scalars)
    assert got == want

    # boolean-class fast path on the same points
    bout = straus.bool_msm_program(ops, X, Y, jnp.asarray(bool_mask))
    bgot = straus.projective_to_host(None, curve, bout)
    bwant = _host_msm(curve, pts, list(bool_mask))
    assert bgot == bwant
