"""Marlin + KZG: universal setup -> index -> prove -> verify.

Parity with the reference's Marlin flow (src/examples/marlin.rs:69-84,
benches/marlin.rs) on a small circuit: completeness, input binding
(wrong public input fails), and plain KZG commit/open/check.
"""

import pytest

from zkmember_tpu.r1cs.cs import ConstraintSystem
from zkmember_tpu.r1cs import gadgets as g
from zkmember_tpu.snark import kzg, marlin
from zkmember_tpu.utils import rng as frng
from zkmember_tpu.curves import bls12_381 as bls


def toy_circuit(witness_val: int):
    """Public out; private w: constraints (w+1)^2 = t, t * w = out."""
    cs = ConstraintSystem(bls.Fr)
    r = bls.R
    out_val = (witness_val + 1) ** 2 % r * witness_val % r
    out = g.FpVar.new_input(cs, out_val)
    w = g.FpVar.new_witness(cs, witness_val)
    w1 = w.add_constant(1)
    t = w1 * w1
    tw = t * w
    tw.enforce_equal(out, "out")
    return cs, out_val


def test_kzg_commit_open_check():
    rng = frng.test_rng()
    pp = kzg.setup(16, curve="bls12_381", rng=rng)
    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    comm = kzg.commit(pp, coeffs, degree_bound=10)
    z = 123456789
    v, prf = kzg.open_at(pp, coeffs, z)
    assert v == kzg.poly_eval(coeffs, z, bls.R)
    assert kzg.check(pp, comm, z, v, prf)
    assert not kzg.check(pp, comm, z, (v + 1) % bls.R, prf)


def test_marlin_end_to_end():
    rng = frng.test_rng()
    cs, out_val = toy_circuit(7)
    assert cs.is_satisfied()
    pp = marlin.universal_setup(
        cs.num_constraints, cs.num_variables, 32, curve="bls12_381", rng=rng
    )
    ipk, ivk = marlin.index(pp, cs)
    proof = marlin.prove(ipk, cs, rng=rng)
    assert marlin.verify(ivk, [out_val], proof)
    # wrong public input must fail (input binding through x_hat)
    assert not marlin.verify(ivk, [(out_val + 1) % bls.R], proof)


def test_marlin_universal_reuse():
    """One SRS + one index serve a different witness (universal-SRS mode,
    benches/marlin.rs:147-172 semantics at circuit scale)."""
    rng = frng.test_rng()
    cs1, out1 = toy_circuit(7)
    pp = marlin.universal_setup(
        cs1.num_constraints, cs1.num_variables, 32, curve="bls12_381", rng=rng
    )
    ipk, ivk = marlin.index(pp, cs1)
    cs2, out2 = toy_circuit(11)  # same circuit shape, new assignment
    proof = marlin.prove(ipk, cs2, rng=rng)
    assert marlin.verify(ivk, [out2], proof)


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="~70s BW6 48-limb host pipeline; RUN_SLOW=1",
)
def test_marlin_bw6_smoke():
    """BW6-761 toy e2e — regression for the absorb_int field-width crash
    (377-bit Fr public inputs overflowed the hardcoded 32-byte absorb)."""
    from zkmember_tpu.curves import bw6_761 as bw6

    rng = frng.test_rng()
    cs = ConstraintSystem(bw6.Fr)
    r = bw6.R
    # force a public input wider than 256 bits to exercise the width fix
    big = (1 << 300) + 12345
    out_val = big * big % r
    out = g.FpVar.new_input(cs, out_val)
    w = g.FpVar.new_witness(cs, big)
    sq = w * w
    sq.enforce_equal(out, "sq")
    assert cs.is_satisfied()
    pp = marlin.universal_setup(
        cs.num_constraints, cs.num_variables, 16, curve="bw6_761", rng=rng
    )
    ipk, ivk = marlin.index(pp, cs)
    proof = marlin.prove(ipk, cs, rng=rng)
    assert marlin.verify(ivk, [out_val], proof)
    assert not marlin.verify(ivk, [(out_val + 1) % r], proof)


def test_marlin_zk_masking():
    """Same circuit, different prover randomness -> different commitments
    and different beta1 evaluations (witness hiding); both proofs verify."""
    import random

    rng = frng.test_rng()
    cs, out_val = toy_circuit(7)
    pp = marlin.universal_setup(
        cs.num_constraints, cs.num_variables, 32, curve="bls12_381", rng=rng
    )
    ipk, ivk = marlin.index(pp, cs)
    p1 = marlin.prove(ipk, cs, rng=random.Random(101))
    p2 = marlin.prove(ipk, cs, rng=random.Random(202))
    assert marlin.verify(ivk, [out_val], p1)
    assert marlin.verify(ivk, [out_val], p2)
    # commitments to the witness polynomial must not repeat across proofs
    assert p1.comms1[0].c != p2.comms1[0].c, "w_hat commitment is deterministic"
    assert p1.comms1[1].c != p2.comms1[1].c, "z_A commitment is deterministic"
    assert p1.evals_beta1["w_hat"] != p2.evals_beta1["w_hat"]
    assert p1.evals_beta1["z_a"] != p2.evals_beta1["z_a"]


def test_kzg_degree_bound_check():
    """check_degree_bound accepts the true shifted evaluation and rejects a
    forged one (and a commitment without a bound)."""
    rng = frng.test_rng()
    pp = kzg.setup(16, curve="bls12_381", rng=rng)
    coeffs = [3, 1, 4, 1, 5]
    bound = 8
    comm = kzg.commit(pp, coeffs, degree_bound=bound)
    z = 987654321
    v = kzg.poly_eval(coeffs, z, bls.R)
    v_sh = v * pow(z, pp.max_degree - bound, bls.R) % bls.R
    assert kzg.check_degree_bound(pp, comm, z, v, v_sh)
    assert not kzg.check_degree_bound(pp, comm, z, v, (v_sh + 1) % bls.R)
    unbounded = kzg.commit(pp, coeffs)
    assert not kzg.check_degree_bound(pp, unbounded, z, v, v_sh)
