"""Headline benchmark: Groth16 BLS12-381 membership proof generation.

Reproduces the reference's benchmark protocol (benches/groth16.rs:49-137:
build tree -> random member -> path -> circuit -> setup once -> timed prove)
at a registrar size chosen by $BENCH_MEMBERS (default 16; reference sweeps
16..1024, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
vs_baseline = reference_seconds / ours (>1 means faster than the reference's
MacBook Pro numbers from report.pdf p6 Fig 7).
"""

import json
import os
import sys
import time


def _enable_compile_cache():
    import jax

    # keep the cache inside the repo: it survives across driver rounds,
    # so cold remote-compile latency is paid once per kernel signature
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


def main():
    _enable_compile_cache()
    members = int(os.environ.get("BENCH_MEMBERS", "16"))
    # report.pdf p6 Fig 7 (MacBook Pro): ~300 ms at 16 -> ~620 ms at 1024
    baseline_s = {16: 0.300, 50: 0.380, 64: 0.400, 100: 0.450, 128: 0.470,
                  512: 0.560, 1000: 0.620, 1024: 0.620}.get(members, 0.300)

    import random

    from zkmember_tpu.app import circuits as app
    from zkmember_tpu.app.member import Member, generate_members
    from zkmember_tpu.snark import groth16, precompile
    from zkmember_tpu.utils import rng as frng

    t0 = time.time()

    def mark(msg):
        print(f"# [{time.time()-t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

    # fire every kernel compile up front, in parallel, overlapping the
    # host-side parameter sampling / tree build below (remote compiles on
    # the axon backend are high-latency; serial cold-start blew the driver
    # timeout in rounds 1-2)
    # exact circuit size (r1cs.gadgets cost model): leaf rehash 1537 +
    # 3076/level + depth index bools + is_eq 3 + enforce_true 1
    depth = max(1, (members - 1).bit_length())
    n_constraints = 1541 + 3077 * depth
    M = 1 << (n_constraints + 3 - 1).bit_length()  # +3 instance rows
    fleet = precompile.warm_groth16(domain_size=M, verbose=True)
    mark(f"precompile fleet launched (domain {M})")

    rng = frng.test_rng()
    cfg = app.get_config("pedersen381")
    leaf_params, node_params = cfg.setup_params(rng)
    mark("pedersen params")

    ms = generate_members(members)
    # wait for the compile fleet before touching the device: a second
    # in-flight compile of the same program is NOT deduped against the
    # fleet's and would queue behind it on the remote compile service
    fleet.join()
    mark("all kernels compiled")
    digests = Member.hash_batch(leaf_params, ms)
    mark(f"{members} leaf digests")
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    root = tree.root()
    idx = random.Random(0).randrange(members)
    path = tree.generate_proof(idx)
    mark(f"tree depth {tree.depth} + path")
    circuit = app.MerkleTreeCircuit(
        config=cfg,
        leaf_params=leaf_params,
        node_params=node_params,
        root=root,
        leaf_hash=digests[idx],
        authentication_path=path,
    )
    cs = circuit.generate_constraints()
    mark(f"circuit: {cs.num_constraints} constraints, {cs.num_variables} vars")

    pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng)
    mark("groth16 setup")

    # warm-up prove (compiles all kernels), then timed prove
    proof = groth16.prove(pk, cs, rng=rng)
    mark("prove warm-up")
    t1 = time.time()
    proof = groth16.prove(pk, cs, rng=rng)
    prove_s = time.time() - t1
    mark(f"prove: {prove_s:.3f}s")

    ok = groth16.verify(vk, [root, digests[idx]], proof)
    assert ok, "proof failed to verify"
    mark("verified")

    print(json.dumps({
        "metric": f"groth16_bls12_381_prove_{members}members",
        "value": round(prove_s, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / prove_s, 3),
    }))


if __name__ == "__main__":
    main()
