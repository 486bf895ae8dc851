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


def _timed_reps(fn, reps: int):
    """reps wall times -> (last_result, [seconds...])."""
    times, result = [], None
    for _ in range(reps):
        t0 = time.time()
        result = fn()
        times.append(time.time() - t0)
    return result, times


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def bench_groth16(stack: str, sizes, reps: int = 5, out=print, checkpoint_dir=None):
    """Groth16 grid on the v2 (limb-major) prover.

    Protocol (the reference uses Criterion sample_size 10 / 30 s windows,
    benches/groth16.rs:31-35): `reps` timed proves per size after one
    warm-up, reporting every rep plus {min, median}; verify likewise.

    checkpoint_dir: if set, proving keys are loaded from / saved to
    `<dir>/groth16_<curve>_<n>` (utils.checkpoint); a load is reported as
    phase `setup_load` with its real wall time — cold `setup` rows only
    appear when setup actually ran (no fake-0.0 rows: round-4 verdict
    item 9).

    Compile sharing: every circuit's key planes are pinned to the
    grid-wide maximum lane paddings, so all sizes with the same domain
    size M share ONE compiled program set (sizes 50..1024 all pad to
    M=32768 — one compile set covers seven grid cells)."""
    import os

    from zkmember_tpu.snark import prove_lm
    from zkmember_tpu.utils import checkpoint

    curve = "bls12_381" if stack == "pedersen381" else "bw6_761"
    rng = frng.test_rng()
    built = {n: _build(stack, n) for n in sizes}

    def np2(x):
        return 1 << max(0, (x - 1).bit_length())

    pin_bool = max(np2(len(built[n][1].boolean_vars)) for n in sizes)
    pin_g2 = max(
        np2(built[n][1].num_variables - len(built[n][1].boolean_vars))
        for n in sizes
    )
    for n in sizes:
        _, cs, root, leaf = built[n]
        ck = os.path.join(checkpoint_dir, f"groth16_{curve}_{n}") if checkpoint_dir else None
        if ck and os.path.exists(ck + ".json"):
            t0 = time.time()
            pk = checkpoint.load_groth16_keys(ck, device=False)
            vk = pk.vk
            out(_row(curve, "groth16", "setup_load", n, time.time() - t0, cs,
                     note="checkpoint"))
        else:
            t0 = time.time()
            pk, vk = groth16.setup(cs, curve=curve, rng=rng)
            out(_row(curve, "groth16", "setup", n, time.time() - t0, cs,
                     note="cold"))
            if ck:
                os.makedirs(checkpoint_dir, exist_ok=True)
                checkpoint.save_groth16_keys(ck, pk)
        keys = prove_lm.Groth16KeysLM(
            pk, cs, min_bool_lanes=pin_bool, min_g2_lanes=pin_g2,
            min_g2b_lanes=pin_bool,
        )
        prove_lm.warm(keys)
        prove_lm.prove(keys, cs, rng=rng)  # warm-up
        proof, times = _timed_reps(lambda: prove_lm.prove(keys, cs, rng=rng), reps)
        for t in times:
            out(_row(curve, "groth16", "prove", n, t, cs))
        out(_row(curve, "groth16", "prove", n, min(times), cs,
                 stats={"min": round(min(times), 4),
                        "median": round(_median(times), 4), "reps": reps}))
        ok, vtimes = _timed_reps(
            lambda: groth16.verify(vk, [root, leaf], proof), max(reps, 3)
        )
        out(_row(curve, "groth16", "verify", n, min(vtimes), cs, ok=ok,
                 stats={"min": round(min(vtimes), 4),
                        "median": round(_median(vtimes), 4), "reps": len(vtimes)}))
        assert ok


def bench_groth16_batch(stack: str, n_members: int, batch: int, reps: int = 3,
                        out=print, checkpoint_dir=None):
    """Batched proving throughput (proofs/sec) — BASELINE.json's north-star
    metric.  `batch` independent members of ONE registrar prove through a
    single batched kernel invocation per MSM family (prove_lm.prove_batch,
    dp axis); all proofs share the proving key and its Straus tables."""
    import os

    from zkmember_tpu.snark import prove_lm
    from zkmember_tpu.utils import checkpoint

    curve = "bls12_381" if stack == "pedersen381" else "bw6_761"
    rng = frng.test_rng()
    cfg = app.get_config(stack)
    leaf_params, node_params = cfg.setup_params(rng)
    members = generate_members(n_members)
    digests = Member.hash_batch(leaf_params, members)
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    idxs = [random.Random(i).randrange(n_members) for i in range(batch)]
    built = []
    for idx in idxs:
        circuit = app.MerkleTreeCircuit(
            config=cfg,
            leaf_params=leaf_params,
            node_params=node_params,
            root=tree.root(),
            leaf_hash=digests[idx],
            authentication_path=tree.generate_proof(idx),
        )
        built.append((circuit.generate_constraints(), digests[idx]))
    cs0 = built[0][0]
    ck = os.path.join(checkpoint_dir, f"groth16_{curve}_{n_members}") if checkpoint_dir else None
    if ck and os.path.exists(ck + ".json"):
        pk = checkpoint.load_groth16_keys(ck, device=False)
        vk = pk.vk
    else:
        pk, vk = groth16.setup(cs0, curve=curve, rng=rng)
        if ck:
            os.makedirs(checkpoint_dir, exist_ok=True)
            checkpoint.save_groth16_keys(ck, pk)
    keys = prove_lm.Groth16KeysLM(pk, cs0)
    assert keys.g1_tab is not None and keys.g2_tab is not None, (
        "batch mode needs the precomputed-table TPU path"
    )
    cs_list = [cs for cs, _ in built]
    proofs = prove_lm.prove_batch(keys, cs_list, rng=rng)  # warm-up/compile
    times = []
    for _ in range(reps):
        t0 = time.time()
        proofs = prove_lm.prove_batch(keys, cs_list, rng=rng)
        times.append(time.time() - t0)
    best = min(times)
    for (cs, leaf), proof in zip(built, proofs):
        assert groth16.verify(vk, [tree.root(), leaf], proof)
    out(_row(curve, "groth16_batch", "prove", n_members, best, cs0,
             ok=True,
             stats={"batch": batch, "proofs_per_sec": round(batch / best, 3),
                    "median": round(_median(times), 4), "reps": reps}))


def bench_marlin(stack: str, sizes, universal: bool = False, reps: int = 3, out=print):
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
            proof, times = _timed_reps(lambda: marlin.prove(ipk, cs, rng=rng), reps)
            out(_row(curve, "marlin_universal", "prove", n, min(times), cs,
                     stats={"min": round(min(times), 4),
                            "median": round(_median(times), 4), "reps": reps}))
            ok, vtimes = _timed_reps(
                lambda: marlin.verify(ivk, [root, leaf], proof), reps
            )
            out(_row(curve, "marlin_universal", "verify", n, min(vtimes), cs, ok=ok,
                     stats={"min": round(min(vtimes), 4),
                            "median": round(_median(vtimes), 4), "reps": reps}))
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
        proof, times = _timed_reps(lambda: marlin.prove(ipk, cs, rng=rng), reps)
        for t in times:
            out(_row(curve, "marlin", "prove", n, t, cs))
        out(_row(curve, "marlin", "prove", n, min(times), cs,
                 stats={"min": round(min(times), 4),
                        "median": round(_median(times), 4), "reps": reps}))
        ok, vtimes = _timed_reps(
            lambda: marlin.verify(ivk, [root, leaf], proof), reps
        )
        out(_row(curve, "marlin", "verify", n, min(vtimes), cs, ok=ok,
                 stats={"min": round(min(vtimes), 4),
                        "median": round(_median(vtimes), 4), "reps": reps}))
        assert ok


def _row(curve, system, phase, n, seconds, cs, ok=None, note=None, stats=None):
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
    if stats:
        row.update(stats)
    return json.dumps(row)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stack", default="pedersen381",
                    choices=["pedersen381", "pedersen761"])
    ap.add_argument("--sizes", default="16")
    ap.add_argument("--systems", default="groth16")
    ap.add_argument("--universal", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--batch", type=int, default=0,
                    help="batched-proving throughput mode: prove this many "
                    "members of one registrar via prove_batch (proofs/sec)")
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]
    if args.batch:
        bench_groth16_batch(args.stack, sizes[0], args.batch, reps=args.reps,
                            checkpoint_dir=args.checkpoint_dir)
        return 0
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
