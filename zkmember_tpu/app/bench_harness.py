"""Benchmark harness: the reference's Criterion grid, reproduced.

Mirrors /root/reference/benches/groth16.rs + benches/marlin.rs (SURVEY.md
section 2.1 rows "Groth16 bench"/"Marlin bench"): per (curve stack, proving
system, registrar size) — build tree, pick a random member, time prove and
verify; names follow the reference's `{curve}_{system}_{prove|verify}_{n}`
convention.  Marlin supports both circuit-specific indexing and the
universal mode (ONE SRS + index at the max size; smaller registrars padded
to the max with default members — benches/marlin.rs:147-172).

Also measures setup time, which the reference's scratch bench wanted
(benches/macros-edited.rs:54-61).

Run: python -m zkmember_tpu.app.bench_harness --sizes 16,64 --systems groth16
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time

from zkmember_tpu.app import circuits as app
from zkmember_tpu.app.member import Member, generate_members
from zkmember_tpu.snark import groth16, marlin
from zkmember_tpu.utils import rng as frng

# the reference's registrar sizes (benches/groth16.rs:9-20)
DEFAULT_SIZES = [16, 50, 64, 100, 128, 512, 1000, 1024]


def _build(stack: str, n_members: int, pad_to: int | None = None):
    rng = frng.test_rng()
    cfg = app.get_config(stack)
    leaf_params, node_params = cfg.setup_params(rng)
    members = generate_members(n_members)
    digests = Member.hash_batch(leaf_params, members)
    if pad_to is not None and len(digests) < pad_to:
        # universal mode: pad the registrar to the indexed max with default
        # members (benches/marlin.rs:168-172)
        pad_digest = Member.default().hash(leaf_params)
        digests = digests + [pad_digest] * (pad_to - len(digests))
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    idx = random.Random(0).randrange(n_members)
    circuit = app.MerkleTreeCircuit(
        config=cfg,
        leaf_params=leaf_params,
        node_params=node_params,
        root=tree.root(),
        leaf_hash=digests[idx],
        authentication_path=tree.generate_proof(idx),
    )
    return circuit, circuit.generate_constraints(), tree.root(), digests[idx]


def bench_groth16(stack: str, sizes, reps: int = 1, out=print, checkpoint_dir=None):
    """Groth16 grid on the v2 (limb-major) prover.

    checkpoint_dir: if set, proving keys are loaded from / saved to
    `<dir>/groth16_<curve>_<n>` (utils.checkpoint) so the grid never redoes
    setup across runs — the subsystem SURVEY.md section 5.4 calls for."""
    import os

    from zkmember_tpu.snark import prove_lm
    from zkmember_tpu.utils import checkpoint

    curve = "bls12_381" if stack == "pedersen381" else "bw6_761"
    rng = frng.test_rng()
    for n in sizes:
        _, cs, root, leaf = _build(stack, n)
        ck = os.path.join(checkpoint_dir, f"groth16_{curve}_{n}") if checkpoint_dir else None
        if ck and os.path.exists(ck + ".json"):
            pk = checkpoint.load_groth16_keys(ck, device=False)
            vk = pk.vk
            out(_row(curve, "groth16", "setup", n, 0.0, cs, note="checkpoint"))
        else:
            t0 = time.time()
            pk, vk = groth16.setup(cs, curve=curve, rng=rng)
            out(_row(curve, "groth16", "setup", n, time.time() - t0, cs))
            if ck:
                os.makedirs(checkpoint_dir, exist_ok=True)
                checkpoint.save_groth16_keys(ck, pk)
        keys = prove_lm.Groth16KeysLM(pk, cs)
        prove_lm.warm(keys)
        proof = prove_lm.prove(keys, cs, rng=rng)  # warm-up
        for _ in range(reps):
            t0 = time.time()
            proof = prove_lm.prove(keys, cs, rng=rng)
            out(_row(curve, "groth16", "prove", n, time.time() - t0, cs))
        t0 = time.time()
        ok = groth16.verify(vk, [root, leaf], proof)
        out(_row(curve, "groth16", "verify", n, time.time() - t0, cs, ok=ok))
        assert ok


def bench_marlin(stack: str, sizes, universal: bool = False, reps: int = 1, out=print):
    curve = "bls12_381" if stack == "pedersen381" else "bw6_761"
    rng = frng.test_rng()
    if universal:
        # ONE SRS + ONE index at the max size; smaller registrars pad up
        max_n = max(sizes)
        _, cs_max, _, _ = _build(stack, max_n)
        nnz = max(
            sum(len(lc) for lc in m) for m in (cs_max.A, cs_max.B, cs_max.C)
        )
        t0 = time.time()
        pp = marlin.universal_setup(
            cs_max.num_constraints, cs_max.num_variables, nnz, curve=curve, rng=rng
        )
        ipk, ivk = marlin.index(pp, cs_max)
        out(_row(curve, "marlin_universal", "setup+index", max_n, time.time() - t0, cs_max))
        for n in sizes:
            _, cs, root, leaf = _build(stack, n, pad_to=max_n)
            t0 = time.time()
            proof = marlin.prove(ipk, cs, rng=rng)
            out(_row(curve, "marlin_universal", "prove", n, time.time() - t0, cs))
            t0 = time.time()
            ok = marlin.verify(ivk, [root, leaf], proof)
            out(_row(curve, "marlin_universal", "verify", n, time.time() - t0, cs, ok=ok))
            assert ok
        return
    for n in sizes:
        _, cs, root, leaf = _build(stack, n)
        nnz = max(sum(len(lc) for lc in m) for m in (cs.A, cs.B, cs.C))
        t0 = time.time()
        pp = marlin.universal_setup(
            cs.num_constraints, cs.num_variables, nnz, curve=curve, rng=rng
        )
        ipk, ivk = marlin.index(pp, cs)
        out(_row(curve, "marlin", "setup+index", n, time.time() - t0, cs))
        for _ in range(reps):
            t0 = time.time()
            proof = marlin.prove(ipk, cs, rng=rng)
            out(_row(curve, "marlin", "prove", n, time.time() - t0, cs))
        t0 = time.time()
        ok = marlin.verify(ivk, [root, leaf], proof)
        out(_row(curve, "marlin", "verify", n, time.time() - t0, cs, ok=ok))
        assert ok


def _row(curve, system, phase, n, seconds, cs, ok=None, note=None):
    row = {
        "name": f"{curve}_{system}_{phase}_{n}",
        "seconds": round(seconds, 4),
        "constraints": cs.num_constraints,
        "variables": cs.num_variables,
    }
    if ok is not None:
        row["verified"] = bool(ok)
    if note:
        row["note"] = note
    return json.dumps(row)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stack", default="pedersen381",
                    choices=["pedersen381", "pedersen761"])
    ap.add_argument("--sizes", default="16")
    ap.add_argument("--systems", default="groth16")
    ap.add_argument("--universal", action="store_true")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]
    for system in args.systems.split(","):
        if system == "groth16":
            bench_groth16(args.stack, sizes, reps=args.reps,
                          checkpoint_dir=args.checkpoint_dir)
        elif system == "marlin":
            bench_marlin(args.stack, sizes, universal=args.universal, reps=args.reps)
        else:
            print(f"unknown system {system}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
