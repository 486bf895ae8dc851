"""Pairing correctness: bilinearity, non-degeneracy, multi-pairing identity.

These properties are exactly what Groth16/Marlin verification relies on
(reference call sites: Groth16::verify at
/root/reference/src/commitments/pedersen381/mod.rs:70 and
pedersen761/mod.rs).
"""

from zkmember_tpu.curves import bls12_381 as bls
from zkmember_tpu.curves import bw6_761 as bw6


class TestBls12_381Pairing:
    def test_bilinearity(self):
        P, Q = bls.G1_GEN, bls.G2_GEN
        e = bls.pairing
        a, b = 7, 13
        lhs = e(bls.G1.mul(a, P), bls.G2.mul(b, Q))
        rhs = e(P, Q) ** (a * b)
        assert lhs == rhs

    def test_nondegenerate_and_order(self):
        g = bls.pairing(bls.G1_GEN, bls.G2_GEN)
        assert g != bls.Fq12.one()
        assert g**bls.R == bls.Fq12.one()

    def test_multi_pairing_cancellation(self):
        # e(P, Q) * e(-P, Q) == 1
        P, Q = bls.G1_GEN, bls.G2_GEN
        out = bls.multi_pairing([(P, Q), (bls.G1.neg(P), Q)])
        assert out == bls.Fq12.one()


class TestBw6_761Pairing:
    def test_bilinearity(self):
        P, Q = bw6.G1_GEN, bw6.G2_GEN
        e = bw6.pairing
        a, b = 5, 11
        lhs = e(bw6.G1.mul(a, P), bw6.G2.mul(b, Q))
        rhs = e(P, Q) ** (a * b)
        assert lhs == rhs

    def test_nondegenerate_and_order(self):
        g = bw6.pairing(bw6.G1_GEN, bw6.G2_GEN)
        assert g != bw6.Fq6.one()
        assert g**bw6.R == bw6.Fq6.one()

    def test_multi_pairing_cancellation(self):
        P, Q = bw6.G1_GEN, bw6.G2_GEN
        out = bw6.multi_pairing([(P, Q), (bw6.G1.neg(P), Q)])
        assert out == bw6.Fq6.one()
