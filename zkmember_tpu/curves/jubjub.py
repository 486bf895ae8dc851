"""Jubjub: the twisted Edwards curve embedded in BLS12-381's scalar field.

Base field = BLS12-381 Fr (so circuit arithmetic over Fr can reason about
Jubjub points natively — this is what makes Pedersen-hash circuits cheap).
Parameters are the Jubjub spec values, derived not copied:
    a = -1,  d = -(10240/10241) mod r.

Capability parity: `ark-ed-on-bls12-381` (SURVEY.md section 2.2 row 2;
reference use site /root/reference/src/commitments/pedersen381/common.rs:13).
"""

from __future__ import annotations

from zkmember_tpu.curves.bls12_381 import Fr, R
from zkmember_tpu.curves.host import TECurve

P = R  # base field modulus (= BLS12-381 scalar modulus)
Fq = Fr  # Jubjub's base field class is BLS12-381's Fr

A = Fq(-1)
D = Fq(-10240) * Fq(10241).inv()

# Prime order of the large subgroup and cofactor (verified in tests via the
# Hasse bound and random-point order checks; the curve order is 8 * ORDER).
ORDER = 0x0E7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7
COFACTOR = 8

CURVE = TECurve(Fq, A, D, order=ORDER, cofactor=COFACTOR, name="Jubjub")


def _find_generator():
    """Deterministic generator: smallest y lifting to a point of order ORDER."""
    y = 2
    while True:
        pt = CURVE.lift_y(Fq(y), x_sign=0)
        if pt is not None:
            g = CURVE.mul(COFACTOR, pt)
            if not CURVE.is_identity(g):
                return g
        y += 1


GENERATOR = _find_generator()
CURVE.generator = GENERATOR
