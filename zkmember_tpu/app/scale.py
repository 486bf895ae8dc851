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


def run_depth(depth: int = 32, checkpoint_dir: str | None = None, out=print):
    from zkmember_tpu.snark import prove_lm
    from zkmember_tpu.utils import checkpoint

    t_all = time.time()

    def row(phase, seconds, **kw):
        out(json.dumps({
            "name": f"bls12_381_groth16_depth{depth}_{phase}",
            "seconds": round(seconds, 3),
            **kw,
        }))

    rng = frng.test_rng()
    cfg = app.get_config("pedersen381")
    leaf_params, node_params = cfg.setup_params(rng)
    root, leaf_digest, path = synthetic_path(cfg, leaf_params, node_params, depth)

    t0 = time.time()
    circuit = app.MerkleTreeCircuit(
        config=cfg,
        leaf_params=leaf_params,
        node_params=node_params,
        root=root,
        leaf_hash=leaf_digest,
        authentication_path=path,
    )
    cs = circuit.generate_constraints()
    assert cs.is_satisfied(), "synthetic path must satisfy the circuit"
    row("trace", time.time() - t0, constraints=cs.num_constraints,
        variables=cs.num_variables, booleans=len(cs.boolean_vars))

    ck = (
        os.path.join(checkpoint_dir, f"groth16_bls12_381_depth{depth}")
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
    ok = groth16.verify(vk, [root, leaf_digest], proof)
    row("verify", time.time() - t0, verified=bool(ok))
    assert ok
    row("total", time.time() - t_all)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args(argv)
    run_depth(args.depth, args.checkpoint_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
