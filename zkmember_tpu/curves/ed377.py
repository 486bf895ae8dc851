"""Embedded twisted Edwards curve over BW6-761's scalar field (= BLS12-377 Fq).

Fills the role of `ark-ed-on-bw6-761` in the reference's pedersen761 stack
(SURVEY.md section 2.2 row 2; use site
/root/reference/src/commitments/pedersen761/common.rs:17): the Pedersen CRH
for the BW6-761 configuration hashes on an Edwards curve whose base field is
BW6-761's Fr, so the hash gadget is native to BW6-761 circuits.

Parameter note: arkworks' exact `d` constant is not reproducible offline, so
this curve uses the *deterministic minimal* complete twisted Edwards curve
over the same field: a = -1 (a square, since q = 1 mod 4) and d = the
smallest non-square >= 2.  Completeness of the addition law and therefore all
hashing/gadget semantics are identical; only the group constant differs.
Pedersen hashing never uses the curve's scalar field or group order — it only
adds and doubles points — so an unknown cofactor does not affect any
functional path.  Generator sampling clears a factor of 8 to drop small
torsion, mirroring the Jubjub convention.
"""

from __future__ import annotations

from zkmember_tpu.curves.bw6_761 import Fr, R
from zkmember_tpu.curves.host import TECurve

P = R  # base field modulus (377 bits)
Fq = Fr

assert P % 4 == 1  # -1 is a square -> a = -1 keeps the law complete


def _smallest_nonsquare() -> int:
    d = 2
    while pow(d, (P - 1) // 2, P) == 1:
        d += 1
    return d


A = Fq(-1)
D = Fq(_smallest_nonsquare())
COFACTOR = 8  # torsion-clearing factor used when sampling points

CURVE = TECurve(Fq, A, D, cofactor=COFACTOR, name="Ed377")


def _find_generator():
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
