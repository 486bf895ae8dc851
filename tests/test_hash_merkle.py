"""Pedersen CRH + Merkle tree: host oracle vs device kernels, path verify.

Mirrors the reference's unit tests (SURVEY.md section 4): tree padding
(one/two/three leaves), host Merkle proof verify, plus the device/host
hash equivalence the reference gets for free by having one implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkmember_tpu.fields import device as dv
from zkmember_tpu.hash import pedersen as ph
from zkmember_tpu.app import circuits as app
from zkmember_tpu.app.member import Member, generate_members
from zkmember_tpu.merkle.tree import path_verify_host
from zkmember_tpu.utils import rng as frng


@pytest.fixture(scope="module")
def params381():
    cfg = app.get_config("pedersen381")
    return cfg, *cfg.setup_params(frng.test_rng())


def test_device_hash_matches_host(params381):
    cfg, leaf_params, node_params = params381
    msgs = [b"hello zkmember", b"", b"x" * 72, bytes(range(64))]
    want = [ph.hash_bytes_host(leaf_params, m).v for m in msgs]
    cap = leaf_params.window.capacity_bits
    bits = jnp.asarray(np.stack([ph.bytes_to_bits(m, cap) for m in msgs]))
    got = dv.limbs_to_ints(np.asarray(ph.hash_bits_device(leaf_params, bits)))
    assert got == want


def test_two_to_one_matches_host(params381):
    cfg, leaf_params, node_params = params381
    spec = node_params.spec
    import random

    r = random.Random(3)
    ls = [r.randrange(spec.p) for _ in range(4)]
    rs = [r.randrange(spec.p) for _ in range(4)]
    want = [
        ph.two_to_one_host(
            node_params, l.to_bytes(32, "little"), rr.to_bytes(32, "little")
        ).v
        for l, rr in zip(ls, rs)
    ]
    dl = jnp.asarray(dv.ints_to_limbs(ls, spec.n))
    dr = jnp.asarray(dv.ints_to_limbs(rs, spec.n))
    got = dv.limbs_to_ints(np.asarray(ph.two_to_one_device(node_params, dl, dr)))
    assert got == want


def test_clean_membership_list(params381):
    """one_leaf / two_leaves / three_leaves parity (common.rs:133-173)."""
    cfg, leaf_params, _ = params381
    d = Member.default().hash(leaf_params)
    assert len(app.clean_membership_list(leaf_params, [d])) == 2
    assert len(app.clean_membership_list(leaf_params, [d, d])) == 2
    assert len(app.clean_membership_list(leaf_params, [d, d, d])) == 4


def test_merkle_tree_and_path(params381):
    """merkle_tree test parity (common.rs:176-209)."""
    cfg, leaf_params, node_params = params381
    members = generate_members(2)
    digests = [m.hash(leaf_params) for m in members]
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    root = tree.root()
    path = tree.generate_proof(1)
    leaf_bytes = digests[1].to_bytes(32, "little")
    assert path_verify_host(leaf_params, node_params, root, leaf_bytes, path)
    # wrong leaf fails
    wrong = digests[0].to_bytes(32, "little")
    assert not path_verify_host(leaf_params, node_params, root, wrong, path)


def test_member_encoding():
    """Byte-encoding shape parity with member.rs:61-83."""
    from datetime import datetime, timezone

    m = Member(
        id="42",
        email="42@usc.edu",
        join_date=datetime(2023, 1, 1, tzinfo=timezone.utc),
        end_date=None,
    )
    b = m.to_bytes()
    # id + email + 8-byte be timestamp + end tag + pad tag
    assert b == b"42" + b"42@usc.edu" + int(
        datetime(2023, 1, 1, tzinfo=timezone.utc).timestamp()
    ).to_bytes(8, "big") + b"\x00" + b"\x00"
    m2 = Member.new_with_padding("1", "a@b", None, 4)
    assert m2.to_bytes().endswith(b"\x01" + b"\x00" * 4)
    # serde round trip
    m3 = Member.from_json(m.to_json())
    assert (m3.id, m3.email, m3.join_date) == (m.id, m.email, m.join_date)


def test_circuit_satisfied(params381):
    """merkle_tree_constraints_correctness parity (constraint.rs:89-155)."""
    cfg, leaf_params, node_params = params381
    members = generate_members(2)
    digests = [m.hash(leaf_params) for m in members]
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    circuit = app.MerkleTreeCircuit(
        config=cfg,
        leaf_params=leaf_params,
        node_params=node_params,
        root=tree.root(),
        leaf_hash=digests[1],
        authentication_path=tree.generate_proof(1),
    )
    cs = circuit.generate_constraints()
    print(
        f"inputs={cs.num_instance} witnesses={cs.num_witness} "
        f"constraints={cs.num_constraints}"
    )
    bad = cs.which_is_unsatisfied()
    assert bad is None, f"unsatisfied: {bad}"


def test_circuit_soundness_negative(params381):
    """merkle_tree_constraints_soundness parity (constraint.rs:158-236):
    proving membership of org1's member against org2's root must fail."""
    cfg, leaf_params, node_params = params381
    org1 = generate_members(8)
    org2 = [Member.new("9", "9@usc.edu")] + generate_members(8)[1:]
    d1 = [m.hash(leaf_params) for m in org1]
    d2 = [m.hash(leaf_params) for m in org2]
    t1 = app.new_membership_tree(leaf_params, node_params, d1)
    t2 = app.new_membership_tree(leaf_params, node_params, d2)
    circuit = app.MerkleTreeCircuit(
        config=cfg,
        leaf_params=leaf_params,
        node_params=node_params,
        root=t2.root(),  # wrong root
        leaf_hash=d1[4],
        authentication_path=t1.generate_proof(4),
    )
    cs = circuit.generate_constraints()
    assert cs.which_is_unsatisfied() is not None
