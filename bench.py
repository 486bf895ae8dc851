"""Headline benchmark: Groth16 BLS12-381 membership proof generation.

Reproduces the reference's benchmark protocol (benches/groth16.rs:49-137:
build tree -> random member -> path -> circuit -> setup once -> timed
prove) at a registrar size chosen by $BENCH_MEMBERS (default 16; the
reference sweeps 16..1024, BASELINE.md).

Round-4 architecture (the round-1..3 benches all timed out in the driver):
  * proving keys are CHECKPOINTED in-repo (artifacts/); setup runs only
    when the artifact is missing and saves it for the next round;
  * small trees hash on the host (no device warm-up for 31 Pedersen
    evaluations);
  * the prover is the v2 limb-major stack (snark.prove_lm): ~6 compiled
    programs total, persistent-compile-cached in .jax_cache/.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
vs_baseline = reference_seconds / ours (>1 = faster than the reference's
MacBook Pro numbers from report.pdf p6 Fig 7).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _enable_compile_cache():
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # "enable_xla_caches: all" segfaults in put_executable_and_time on this
    # box for one of the MSM executables; default executable cache only.


def main():
    _enable_compile_cache()
    members = int(os.environ.get("BENCH_MEMBERS", "16"))
    # report.pdf p6 Fig 7 (MacBook Pro): ~300 ms at 16 -> ~620 ms at 1024
    baseline_s = {16: 0.300, 50: 0.380, 64: 0.400, 100: 0.450, 128: 0.470,
                  512: 0.560, 1000: 0.620, 1024: 0.620}.get(members, 0.300)

    import random

    from zkmember_tpu.app import circuits as app
    from zkmember_tpu.app.member import generate_members
    from zkmember_tpu.snark import groth16, prove_lm
    from zkmember_tpu.utils import checkpoint, rng as frng

    t0 = time.time()

    def mark(msg):
        print(f"# [{time.time()-t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

    rng = frng.test_rng()
    cfg = app.get_config("pedersen381")
    leaf_params, node_params = cfg.setup_params(rng)
    mark("pedersen params")

    ms = generate_members(members)
    digests = [m.hash(leaf_params) for m in ms]
    tree = app.new_membership_tree(leaf_params, node_params, digests)
    root = tree.root()
    idx = random.Random(0).randrange(members)
    path = tree.generate_proof(idx)
    mark(f"tree depth {tree.depth} + path (host)")

    circuit = app.MerkleTreeCircuit(
        config=cfg,
        leaf_params=leaf_params,
        node_params=node_params,
        root=root,
        leaf_hash=digests[idx],
        authentication_path=path,
    )
    cs = circuit.generate_constraints()
    mark(f"circuit: {cs.num_constraints} constraints, {cs.num_variables} vars, "
         f"{len(cs.boolean_vars)} boolean")

    ck = os.path.join(REPO, "artifacts", f"groth16_bls12_381_{members}")
    if os.path.exists(ck + ".json"):
        pk = checkpoint.load_groth16_keys(ck, device=False)
        vk = pk.vk
        mark("proving key loaded from checkpoint")
    else:
        pk, vk = groth16.setup(cs, curve="bls12_381", rng=rng)
        mark("groth16 setup (cold)")
        os.makedirs(os.path.dirname(ck), exist_ok=True)
        checkpoint.save_groth16_keys(ck, pk)
        mark("proving key checkpointed")

    keys = prove_lm.Groth16KeysLM(pk, cs)
    mark("limb-major key planes resident")

    prove_lm.warm(keys, verbose=True)
    mark("device programs compiled (parallel warm-up)")

    # warm-up prove (everything resident), then timed prove
    proof = prove_lm.prove(keys, cs, rng=rng)
    mark("prove warm-up")
    t1 = time.time()
    proof = prove_lm.prove(keys, cs, rng=rng)
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
