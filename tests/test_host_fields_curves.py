"""Host field/curve layer: constant derivations, group laws, towers.

Mirrors the implicit guarantees zkMember gets from arkworks (SURVEY.md
section 2.2 rows 1-2): field axioms, curve membership of generators,
subgroup orders, tower-extension consistency.
"""

import math
import random

import pytest

from zkmember_tpu.curves import bls12_381 as bls
from zkmember_tpu.curves import bw6_761 as bw6
from zkmember_tpu.curves import ed377, jubjub


def _is_prime(n, k=30):
    if n < 2:
        return False
    for p in [2, 3, 5, 7, 11, 13, 17, 19]:
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(0)
    for _ in range(k):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


class TestDerivedConstants:
    def test_bls381_moduli(self):
        assert bls.Q == int(
            "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
            "1eabfffeb153ffffb9feffffffffaaab",
            16,
        )
        assert bls.R == int(
            "73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16
        )
        assert _is_prime(bls.Q) and _is_prime(bls.R)

    def test_bls381_two_adicity(self):
        assert (bls.R - 1) % (1 << 32) == 0
        assert (bls.R - 1) % (1 << 33) != 0
        w = bls.ROOT_OF_UNITY
        assert pow(w, 1 << 32, bls.R) == 1
        assert pow(w, 1 << 31, bls.R) != 1

    def test_bw6_moduli(self):
        assert bw6.Q.bit_length() == 761
        assert bw6.R.bit_length() == 377
        assert _is_prime(bw6.Q) and _is_prime(bw6.R)
        # BW6 Fr IS BLS12-377's base field, per the 2-chain construction
        assert (bw6.R - 1) % (1 << 46) == 0

    def test_bw6_curve_orders_hasse(self):
        for trace in (bw6.TRACE, bw6.TRACE2):
            assert abs(trace) <= 2 * math.isqrt(bw6.Q) + 1
        assert (bw6.Q + 1 - bw6.TRACE) == bw6.H1 * bw6.R
        assert (bw6.Q + 1 - bw6.TRACE2) == bw6.H2 * bw6.R

    def test_jubjub_order_hasse(self):
        assert _is_prime(jubjub.ORDER)
        assert abs(8 * jubjub.ORDER - (jubjub.P + 1)) <= 2 * math.isqrt(jubjub.P) + 2


class TestFieldAxioms:
    @pytest.mark.parametrize("F", [bls.Fq, bls.Fr, bw6.Fq, bw6.Fr])
    def test_fp_ops(self, F):
        rng = random.Random(1)
        for _ in range(20):
            a, b = F(rng.randrange(F.p)), F(rng.randrange(F.p))
            assert (a + b) - b == a
            assert a * b == b * a
            if not a.is_zero():
                assert a * a.inv() == F.one()
            assert (a * b).v == a.v * b.v % F.p

    def test_sqrt_roundtrip(self):
        rng = random.Random(2)
        for F in (bls.Fq, bls.Fr, bw6.Fq):
            for _ in range(5):
                a = F(rng.randrange(F.p))
                s = a.square()
                r = s.sqrt()
                assert r is not None and r.square() == s

    @pytest.mark.parametrize("E", [bls.Fq2, bls.Fq6, bls.Fq12, bw6.Fq3, bw6.Fq6])
    def test_extension_ops(self, E):
        rng = random.Random(3)

        def rand_elem(cls):
            if hasattr(cls, "p"):
                return cls(rng.randrange(cls.p))
            return cls(*[rand_elem(cls.base) for _ in range(cls.degree)])

        for _ in range(5):
            a, b = rand_elem(E), rand_elem(E)
            assert (a + b) - b == a
            assert a * b == b * a
            if not a.is_zero():
                assert a * a.inv() == E.one()
            # distributivity
            c = rand_elem(E)
            assert a * (b + c) == a * b + a * c


class TestCurves:
    def test_g1_generator(self):
        assert bls.G1.is_on_curve(bls.G1_GEN)
        assert bls.G1.mul(bls.R, bls.G1_GEN) is None

    def test_g2_generator(self):
        assert bls.G2.is_on_curve(bls.G2_GEN)
        assert bls.G2.mul(bls.R, bls.G2_GEN) is None

    def test_bw6_generators(self):
        assert bw6.G1.is_on_curve(bw6.G1_GEN)
        assert bw6.G2.is_on_curve(bw6.G2_GEN)
        assert bw6.G1.mul(bw6.R, bw6.G1_GEN) is None
        assert bw6.G2.mul(bw6.R, bw6.G2_GEN) is None

    def test_sw_group_law(self):
        G = bls.G1
        P = G.mul(12345, bls.G1_GEN)
        Q = G.mul(67890, bls.G1_GEN)
        assert G.add(P, Q) == G.mul(12345 + 67890, bls.G1_GEN)
        assert G.add(P, G.neg(P)) is None

    def test_jubjub_group_law(self):
        C = jubjub.CURVE
        g = jubjub.GENERATOR
        assert C.is_on_curve(g)
        assert C.is_identity(C.mul(jubjub.ORDER, g))
        P = C.mul(111, g)
        Q = C.mul(222, g)
        assert C.add(P, Q) == C.mul(333, g)
        assert C.is_identity(C.add(P, C.neg(P)))

    def test_ed377_complete_law(self):
        C = ed377.CURVE
        g = ed377.GENERATOR
        assert C.is_on_curve(g)
        P = C.mul(17, g)
        Q = C.mul(23, g)
        assert C.add(P, Q) == C.mul(40, g)
        assert C.add(P, P) == C.double(P)
