"""Scale configurations: depth-32 membership proving (BASELINE configs 2/5).

The reference never exceeds depth-10 trees (1024 members); the TPU
framework's scaling axis is constraint count (SURVEY.md section 5.7).  A
depth-32 membership circuit has 1541 + 3077*32 + 35 = ~100k constraints
(domain 2^17).  Building a real 2^32-leaf tree is neither possible nor
needed: the circuit only consumes an authentication path, so this module
synthesizes a random depth-32 path and computes the matching root by
hashing upward — a perfectly valid witness for the exact circuit shape a
2^32-member registrar would produce.

Run:  python -m zkmember_tpu.app.scale [--depth 32] [--checkpoint-dir artifacts]
Emits one JSON line per phase (trace/setup/prove/verify) — the committed
evidence for the 2^17-constraint scale point.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

from zkmember_tpu.app import circuits as app
from zkmember_tpu.hash import pedersen as ph
from zkmember_tpu.merkle.tree import MerklePath
from zkmember_tpu.snark import groth16
from zkmember_tpu.utils import rng as frng


def synthetic_path(cfg, leaf_params, node_params, depth: int, seed: int = 0):
    """(root, leaf_digest, MerklePath) for a random depth-`depth` branch."""
    rng = random.Random(seed)
    p = cfg.scalar_field.p
    spec_bytes = node_params.spec.n * 2
    leaf_digest = rng.randrange(p)  # the app-level member digest (public)
    # tree-level leaf hash of the app-level digest (matching MerkleTree)
    cur = ph.hash_bytes_host(
        leaf_params, int(leaf_digest).to_bytes(spec_bytes, "little")
    ).v
    index = rng.getrandbits(depth)
    sibs = []
    node = cur
    for lvl in range(depth):
        sib = rng.randrange(p)
        sibs.append(sib)
        bit = (index >> lvl) & 1
        l, r = (sib, node) if bit else (node, sib)
        node = ph.two_to_one_host(
            node_params,
            int(l).to_bytes(spec_bytes, "little"),
            int(r).to_bytes(spec_bytes, "little"),
        ).v
    path = MerklePath(leaf_index=index, siblings=sibs, leaf_digest=cur)
    return node, leaf_digest, path


def run_depth(depth: int = 32, checkpoint_dir: str | None = None, out=print,
              batch: int = 1):
    """batch > 1 proves `batch` independent depth-`depth` memberships in ONE
    circuit (BASELINE config 2: depth-32, batch of member proofs) — the
    2^20-constraint scale shape at batch=8."""
    from zkmember_tpu.r1cs.cs import ConstraintSystem
    from zkmember_tpu.r1cs import gadgets as g
    from zkmember_tpu.snark import prove_lm
    from zkmember_tpu.utils import checkpoint

    t_all = time.time()
    tag = f"depth{depth}" + (f"_batch{batch}" if batch > 1 else "")

    def row(phase, seconds, **kw):
        out(json.dumps({
            "name": f"bls12_381_groth16_{tag}_{phase}",
            "seconds": round(seconds, 3),
            **kw,
        }))

    rng = frng.test_rng()
    cfg = app.get_config("pedersen381")
    leaf_params, node_params = cfg.setup_params(rng)
    cases = [
        synthetic_path(cfg, leaf_params, node_params, depth, seed=i)
        for i in range(batch)
    ]

    t0 = time.time()
    if batch == 1:
        root, leaf_digest, path = cases[0]
        circuit = app.MerkleTreeCircuit(
            config=cfg,
            leaf_params=leaf_params,
            node_params=node_params,
            root=root,
            leaf_hash=leaf_digest,
            authentication_path=path,
        )
        cs = circuit.generate_constraints()
        public_inputs = [root, leaf_digest]
    else:
        # one R1CS, `batch` independent membership sub-circuits
        cs = ConstraintSystem(cfg.scalar_field)
        io = []
        for root, leaf_digest, path in cases:
            io.append(g.FpVar.new_input(cs, root))
            io.append(g.FpVar.new_input(cs, leaf_digest))
        k = 0
        for root, leaf_digest, path in cases:
            root_v, leaf_v = io[k], io[k + 1]
            k += 2
            d = len(path.siblings)
            index_bits = [
                g.Boolean.new_witness(cs, (path.leaf_index >> i) & 1)
                for i in range(d)
            ]
            sibling_vars = [g.FpVar.new_witness(cs, s) for s in path.siblings]
            ok = g.merkle_path_gadget(
                cs, leaf_params, node_params, root_v, leaf_v, index_bits,
                sibling_vars,
            )
            ok.enforce_true()
        public_inputs = [v for c in cases for v in (c[0], c[1])]
    assert cs.is_satisfied(), "synthetic paths must satisfy the circuit"
    row("trace", time.time() - t0, constraints=cs.num_constraints,
        variables=cs.num_variables, booleans=len(cs.boolean_vars))
    root, leaf_digest = cases[0][0], cases[0][1]

    ck = (
        os.path.join(checkpoint_dir, f"groth16_bls12_381_{tag}")
        if checkpoint_dir
        else None
    )
    if ck and os.path.exists(ck + ".json"):
        t0 = time.time()
        pk = checkpoint.load_groth16_keys(ck, device=False)
        vk = pk.vk
        row("load_keys", time.time() - t0, domain=pk.domain_size)
    else:
        t0 = time.time()
        pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng)
        row("setup", time.time() - t0, domain=pk.domain_size)
        if ck:
            os.makedirs(checkpoint_dir, exist_ok=True)
            checkpoint.save_groth16_keys(ck, pk)

    t0 = time.time()
    keys = prove_lm.Groth16KeysLM(pk, cs)
    prove_lm.warm(keys, verbose=True)
    row("keys+warm", time.time() - t0)

    proof = prove_lm.prove(keys, cs, rng=rng)
    t0 = time.time()
    proof = prove_lm.prove(keys, cs, rng=rng)
    row("prove", time.time() - t0)

    t0 = time.time()
    ok = groth16.verify(vk, public_inputs, proof)
    row("verify", time.time() - t0, verified=bool(ok))
    assert ok
    row("total", time.time() - t_all)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args(argv)
    run_depth(args.depth, args.checkpoint_dir, batch=args.batch)
    return 0


if __name__ == "__main__":
    sys.exit(main())
