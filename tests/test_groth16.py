"""Groth16 end-to-end: setup -> prove -> verify on the membership circuit.

Parity with the reference's test_groth16_snark (pedersen381/mod.rs:19-74):
build members, hash leaves, build tree, generate path, construct the
circuit, run circuit_specific_setup / prove / verify, and check that a
wrong public input fails verification.
"""

import os

import pytest

from zkmember_tpu.app import circuits as app
from zkmember_tpu.app.member import generate_members
from zkmember_tpu.r1cs.cs import ConstraintSystem
from zkmember_tpu.r1cs import gadgets as g
from zkmember_tpu.snark import groth16
from zkmember_tpu.utils import rng as frng
from zkmember_tpu.curves import bls12_381 as bls


def test_groth16_toy_circuit():
    """Fast e2e on a small circuit: setup -> prove -> verify + negative."""
    rng = frng.test_rng()
    cs = ConstraintSystem(bls.Fr)
    r = bls.R
    out_val = pow(8, 3, r)
    out = g.FpVar.new_input(cs, out_val)
    w = g.FpVar.new_witness(cs, 8)
    t = w * w
    tw = t * w
    tw.enforce_equal(out, "cube")
    assert cs.is_satisfied()

    # host=True: ~6 points, host scalar muls are instant; the device
    # fixed-base setup path is exercised by the TPU grid (bench_harness)
    pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng, host=True)
    proof = groth16.prove(pk, cs, rng=rng)
    assert groth16.verify(vk, [out_val], proof)
    assert not groth16.verify(vk, [(out_val + 1) % r], proof)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="BW6-761 e2e (48-limb kernels) is slow on the 2-core CPU box; "
    "run with RUN_SLOW=1",
)
def test_groth16_toy_circuit_bw6_761():
    """Same toy e2e over the BW6-761 stack (761-bit base field, G2 on Fq)."""
    from zkmember_tpu.curves import bw6_761 as bw6

    rng = frng.test_rng()
    cs = ConstraintSystem(bw6.Fr)
    r = bw6.R
    out_val = pow(5, 3, r)
    out = g.FpVar.new_input(cs, out_val)
    w = g.FpVar.new_witness(cs, 5)
    t = w * w
    tw = t * w
    tw.enforce_equal(out, "cube")
    pk, vk = groth16.setup(cs, curve="bw6_761", rng=rng)
    proof = groth16.prove(pk, cs, rng=rng)
    assert groth16.verify(vk, [out_val], proof)
    assert not groth16.verify(vk, [(out_val + 1) % r], proof)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="full membership-circuit e2e takes ~1h on the 2-core CPU test box; "
    "run with RUN_SLOW=1 or on TPU via bench.py",
)
def test_groth16_snark_bls12_381():
    rng = frng.test_rng()
    cfg = app.get_config("pedersen381")
    leaf_params, node_params = cfg.setup_params(rng)

    members = generate_members(2)
    digests = [m.hash(leaf_params) for m in members]
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    root = tree.root()
    path = tree.generate_proof(1)

    circuit = app.MerkleTreeCircuit(
        config=cfg,
        leaf_params=leaf_params,
        node_params=node_params,
        root=root,
        leaf_hash=digests[1],
        authentication_path=path,
    )
    cs = circuit.generate_constraints()
    assert cs.is_satisfied()

    pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng)
    proof = groth16.prove(pk, cs, rng=rng)

    assert groth16.verify(vk, [root, digests[1]], proof)
    # wrong leaf digest must fail (mod.rs:70-71 semantics)
    assert not groth16.verify(vk, [root, digests[0]], proof)
