"""v2 prover (limb-major stack): NTT pipeline + end-to-end Groth16 prove.

The e2e reuses the v1 setup/verify (groth16.py) — the proof produced by
prove_lm must verify under the same pairing check, and a v1-proof and
v2-proof of the same circuit must both verify (cross-implementation
agreement at the proof level; exact byte equality is not expected because
both consume the RNG identically but MSM grouping differs only in order)."""

import numpy as np
import pytest

from zkmember_tpu.fields import device as dv
from zkmember_tpu.fields import lm
from zkmember_tpu.ntt import lm as nttlm
from zkmember_tpu.ntt.ntt import Domain
from zkmember_tpu.r1cs.cs import ConstraintSystem
from zkmember_tpu.r1cs import gadgets as g
from zkmember_tpu.snark import groth16, prove_lm
from zkmember_tpu.utils import rng as frng
from zkmember_tpu.utils import poly as hostpoly
from zkmember_tpu.curves import bls12_381 as bls


def test_ntt_lm_round_trip_vs_host():
    import random

    rng = random.Random(11)
    spec = dv.BLS_FR
    N = 16
    dom = Domain.get(spec, N)
    dlm = nttlm.DomainLM.get(spec, N)
    coeffs = [rng.randrange(spec.p) for _ in range(N)]
    x = lm.to_lm(spec.to_mont_host(coeffs))
    evals = nttlm.ntt(spec, x, dlm.tw_fwd, dlm.perm)
    got = spec.from_mont_host(lm.from_lm(evals))
    want = hostpoly.host_ntt(coeffs, dom.w, spec.p)
    assert got == want


def test_groth16_h_lm_matches_v1():
    """The one-program H pipeline equals the v1 h_kernel output."""
    import random

    rng = random.Random(13)
    spec = dv.BLS_FR
    N = 16
    dom = Domain.get(spec, N)
    dlm = nttlm.DomainLM.get(spec, N)
    a = [rng.randrange(spec.p) for _ in range(N)]
    b = [rng.randrange(spec.p) for _ in range(N)]
    # make c = a*b pointwise so H is exactly divisible (as in a satisfied CS)
    c = [x * y % spec.p for x, y in zip(a, b)]
    import jax.numpy as jnp

    da_v1 = jnp.asarray(spec.to_mont_host(a))
    db_v1 = jnp.asarray(spec.to_mont_host(b))
    dc_v1 = jnp.asarray(spec.to_mont_host(c))
    zh_inv = jnp.asarray(spec.mont_scalar(pow(dom.vanishing_on_coset(), -1, spec.p)))
    h_v1 = spec.from_mont_host(np.asarray(groth16._h_kernel(dom, da_v1, db_v1, dc_v1, zh_inv)))

    h_v2_limbs = nttlm.groth16_h(
        dlm, lm.to_lm(spec.to_mont_host(a)), lm.to_lm(spec.to_mont_host(b)),
        lm.to_lm(spec.to_mont_host(c))
    )
    # v2 output is canonical (non-Montgomery) limbs
    h_v2 = [sum(int(v) << (16 * i) for i, v in enumerate(row))
            for row in lm.from_lm(h_v2_limbs)]
    assert h_v2 == h_v1


def _cube_cs():
    cs = ConstraintSystem(bls.Fr)
    r = bls.R
    out_val = pow(8, 3, r)
    out = g.FpVar.new_input(cs, out_val)
    w = g.FpVar.new_witness(cs, 8)
    t = w * w
    tw = t * w
    tw.enforce_equal(out, "cube")
    # a few boolean witnesses so the bool class path is exercised
    b1 = g.Boolean.new_witness(cs, 1)
    b0 = g.Boolean.new_witness(cs, 0)
    s = b1.select(out, g.FpVar.constant(cs, 0))
    s.enforce_equal(out, "sel")
    z = b0.select(out, g.FpVar.constant(cs, 0))
    z.enforce_equal(g.FpVar.constant(cs, 0), "zsel")
    return cs, out_val


def test_prove_lm_toy_e2e():
    rng = frng.test_rng()
    cs, out_val = _cube_cs()
    assert cs.is_satisfied()
    assert cs.boolean_vars, "bool class must be populated"
    pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng)
    keys = prove_lm.Groth16KeysLM(pk, cs)
    proof = prove_lm.prove(keys, cs, rng=rng)
    assert groth16.verify(vk, [out_val], proof)
    assert not groth16.verify(vk, [(out_val + 1) % bls.R], proof)


def test_prove_lm_sharded_8dev():
    """Full prove with every MSM sharded over the 8-virtual-device mesh
    (the multichip path the driver dryruns; SURVEY.md sections 2.3/5.8)."""
    import jax
    from zkmember_tpu.parallel import dist

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    mesh = dist.make_mesh(8, dp=1)
    rng = frng.test_rng()
    cs, out_val = _cube_cs()
    pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng)
    keys = prove_lm.Groth16KeysLM(pk, cs, min_lanes=8)
    proof = prove_lm.prove(keys, cs, rng=rng, mesh=mesh)
    assert groth16.verify(vk, [out_val], proof)


def test_checkpoint_round_trip_proves(tmp_path):
    """Keys survive save/load (utils.checkpoint) and the loaded key proves —
    the persistence subsystem the driver bench relies on (SURVEY.md 5.4)."""
    from zkmember_tpu.utils import checkpoint

    rng = frng.test_rng()
    cs, out_val = _cube_cs()
    pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng)
    path = str(tmp_path / "toy_keys")
    checkpoint.save_groth16_keys(path, pk)
    pk2 = checkpoint.load_groth16_keys(path, device=False)
    assert pk2.domain_size == pk.domain_size
    keys = prove_lm.Groth16KeysLM(pk2, cs)
    proof = prove_lm.prove(keys, cs, rng=rng)
    assert groth16.verify(pk2.vk, [out_val], proof)


def test_synthetic_depth_path_satisfies():
    """app.scale's synthetic deep path produces a satisfiable circuit (the
    depth-32 scale config runs the same code at depth 3 here)."""
    from zkmember_tpu.app import scale

    rng = frng.test_rng()
    from zkmember_tpu.app import circuits as app

    cfg = app.get_config("pedersen381")
    leaf_params, node_params = cfg.setup_params(rng)
    root, leaf_digest, path = scale.synthetic_path(cfg, leaf_params, node_params, 3)
    circuit = app.MerkleTreeCircuit(
        config=cfg, leaf_params=leaf_params, node_params=node_params,
        root=root, leaf_hash=leaf_digest, authentication_path=path,
    )
    cs = circuit.generate_constraints()
    assert cs.is_satisfied()
    # tampered root must NOT satisfy
    bad = app.MerkleTreeCircuit(
        config=cfg, leaf_params=leaf_params, node_params=node_params,
        root=(root + 1) % cfg.scalar_field.p, leaf_hash=leaf_digest,
        authentication_path=path,
    )
    cs2 = bad.generate_constraints()
    assert not cs2.is_satisfied()


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="~30min cold on the 2-core CPU box (M=2^14 program compiles). "
    "The SAME membership prove+verify runs un-gated every round on TPU via "
    "bench.py (which asserts verification); RUN_SLOW=1 runs it here too.",
)
def test_membership_16_from_checkpoint():
    """REAL membership-circuit e2e: rebuilds the 16-member registrar
    deterministically, loads the committed proving-key artifact
    (artifacts/groth16_bls12_381_16), proves with the v2 stack and verifies
    (+ wrong-leaf rejection)."""
    import os
    import random as pyrandom

    from zkmember_tpu.app import circuits as app
    from zkmember_tpu.app.member import generate_members
    from zkmember_tpu.utils import checkpoint

    ck = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "groth16_bls12_381_16",
    )
    if not os.path.exists(ck + ".json"):
        pytest.skip("checkpoint artifact not present")

    rng = frng.test_rng()
    cfg = app.get_config("pedersen381")
    leaf_params, node_params = cfg.setup_params(rng)
    ms = generate_members(16)
    digests = [m.hash(leaf_params) for m in ms]
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    idx = pyrandom.Random(0).randrange(16)
    circuit = app.MerkleTreeCircuit(
        config=cfg, leaf_params=leaf_params, node_params=node_params,
        root=tree.root(), leaf_hash=digests[idx],
        authentication_path=tree.generate_proof(idx),
    )
    cs = circuit.generate_constraints()
    pk = checkpoint.load_groth16_keys(ck, device=False)
    keys = prove_lm.Groth16KeysLM(pk, cs)
    proof = prove_lm.prove(keys, cs, rng=rng)
    assert groth16.verify(pk.vk, [tree.root(), digests[idx]], proof)
    assert not groth16.verify(pk.vk, [tree.root(), digests[(idx + 1) % 16]], proof)


import pytest as _pytest


@_pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="batched interpret-mode kernel run ~25min on the 2-core box; "
    "RUN_SLOW=1 (the TPU bench harness --batch mode validates it end-to-end)",
)
def test_prove_batch_shared_tables():
    """prove_batch: P proofs over one key through the batched kernel
    (interpret mode via a tiny kernel tile); every proof verifies against
    its own public input."""
    import os

    os.environ.setdefault("ZKMEMBER_PALLAS_MSM_TILE", "8")
    from zkmember_tpu.curves import bls12_381 as bls
    from zkmember_tpu.r1cs import gadgets as g
    from zkmember_tpu.r1cs.cs import ConstraintSystem
    from zkmember_tpu.snark import groth16, prove_lm
    from zkmember_tpu.utils import rng as frng

    def build(wv):
        cs = ConstraintSystem(bls.Fr)
        out_val = pow(wv, 3, bls.R)
        out = g.FpVar.new_input(cs, out_val)
        w = g.FpVar.new_witness(cs, wv)
        (w * w * w).enforce_equal(out, "cube")
        return cs, out_val

    rng = frng.test_rng()
    cs0, v0 = build(3)
    pk, vk = groth16.setup(cs0, curve="bls12_381", rng=rng, host=True)
    keys = prove_lm.Groth16KeysLM(pk, cs0, min_g2_lanes=8)
    if keys.g1_tab is None or keys.g2_tab is None:
        import pytest

        pytest.skip("precomp tables unsupported at this shape")
    cs1, v1 = build(5)
    proofs = prove_lm.prove_batch(keys, [cs0, cs1], rng=rng)
    assert groth16.verify(vk, [v0], proofs[0])
    assert groth16.verify(vk, [v1], proofs[1])
    assert not groth16.verify(vk, [v0], proofs[1])
