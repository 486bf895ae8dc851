"""Ahead-of-time parallel warm-up of every device program a proof needs.

The axon TPU backend compiles remotely with high and highly-variable
latency (observed 5s .. 300s per program under service load).  A cold
prover serially hits ~10 distinct programs, so worst-case cold start is
tens of minutes.  This module issues ALL compiles up front from a thread
pool: XLA compilation releases the GIL (it is an RPC on this backend), so
the waits overlap and cold start collapses to ~max(single compile).

Every kernel here is invoked with zero/dummy inputs at its canonical tile
shape — compile results land in the in-process jit cache and (CPU backend
only) the local persistent compilation cache.  NOTE: on the axon TPU
backend the persistent cache does NOT hit across processes (verified:
identical programs recompile in a fresh process), so every TPU run pays
cold compiles; the parallel warm-up here is what bounds them.

Reference counterpart: none — arkworks compiles ahead of time by virtue of
being Rust.  This is the TPU-native equivalent of that property.
"""

from __future__ import annotations

import sys
import threading
import time



def _log(enabled, msg):
    if enabled:
        print(f"# [precompile] {msg}", file=sys.stderr, flush=True)


def _jobs_groth16(curve: str, domain_size: int, hash_caps: tuple[int, ...]):
    """Build the (name, thunk) list for one Groth16 proving configuration."""
    import jax
    import jax.numpy as jnp

    from zkmember_tpu.fields import device as dv
    import zkmember_tpu.msm.msm as msmmod
    from zkmember_tpu import ntt as nttmod
    from zkmember_tpu.hash import pedersen as ph
    from zkmember_tpu.snark import groth16

    cfg = groth16.pairing_config(curve)
    mod = cfg.mod
    F1, F2 = cfg.F1, cfg.F2
    fr = cfg.fr_spec
    T = msmmod.tile()
    HT = ph.hash_tile()
    nwin4 = (cfg.r.bit_length() + msmmod.WINDOW_BITS - 1) // msmmod.WINDOW_BITS
    nwin8 = (cfg.r.bit_length() + 7) // 8

    ops1 = msmmod.sw_ops_for_curve(F1, mod.G1)
    ops2 = msmmod.sw_ops_for_curve(F2, mod.G2)

    def f1_zeros(shape):
        return F1.zeros(shape)

    def f2_zeros(shape):
        return F2.zeros(shape)

    jobs = []

    # -- Pedersen hash kernels (leaf + two-to-one window shapes) -------------
    te_spec = fr  # TE base field == pairing scalar field for both stacks
    Fte = dv.FpOps(te_spec)
    for cap in hash_caps:
        def hash_job(cap=cap):
            ws = 4
            nw = cap // ws
            a = jnp.zeros((te_spec.n,), jnp.uint32)
            d = jnp.zeros((te_spec.n,), jnp.uint32)
            tg = jnp.zeros((nw, 1 << ws, te_spec.n), jnp.uint32)
            bits = jnp.zeros((HT, cap), jnp.uint32)
            jax.block_until_ready(
                ph._hash_kernel(Fte, ws, a, d, tg, tg, tg, bits)
            )

        jobs.append((f"hash{cap}", hash_job))

    # -- fixed-base key-gen kernels (G1 + G2) --------------------------------
    def fixed_base_job(ops, zeros, tag):
        def run():
            digits = jnp.zeros((T, nwin4), jnp.uint32)
            TX = zeros((nwin4, 1 << msmmod.WINDOW_BITS))
            J = groth16._fixed_base_kernel(ops, digits, TX, TX, TX)
            jax.block_until_ready(msmmod._affine_tile_kernel(ops, *J))

        return (f"fixed_base_{tag}", run)

    jobs.append(fixed_base_job(ops1, f1_zeros, "g1"))
    jobs.append(fixed_base_job(ops2, f2_zeros, "g2"))

    # -- H pipeline (six NTT cores + pointwise) ------------------------------
    def h_job():
        domain = nttmod.Domain.get(fr, domain_size)
        z = jnp.zeros((domain_size, fr.n), jnp.uint32)
        zh = jnp.zeros((fr.n,), jnp.uint32)
        jax.block_until_ready(groth16._h_kernel(domain, z, z, z, zh))

    jobs.append((f"h_kernel_{domain_size}", h_job))

    # -- proof MSM kernels ----------------------------------------------------
    def msm_jobs(ops, zeros, tag):
        def bool_job():
            X = zeros((T,))
            jax.block_until_ready(
                msmmod._bool_partial_kernel(ops, jnp.zeros((T,), jnp.uint32), X, X)
            )

        def gen_job():
            X = zeros((T,))
            digits = jnp.zeros((T, nwin8), jnp.uint32)
            jax.block_until_ready(msmmod._pippenger_partial_kernel(ops, digits, X, X))

        def finish_job():
            J = zeros((msmmod.COMBINE_WIDTH,))
            jax.block_until_ready(msmmod._finish_kernel(ops, J, J, J))

        return [
            (f"msm_bool_{tag}", bool_job),
            (f"msm_gen_{tag}", gen_job),
            (f"msm_finish_{tag}", finish_job),
        ]

    jobs += msm_jobs(ops1, f1_zeros, "g1")
    jobs += msm_jobs(ops2, f2_zeros, "g2")
    return jobs


def warm_groth16(
    curve: str = "bls12_381",
    domain_size: int = 1 << 14,
    hash_caps: tuple[int, ...] = (576, 512),
    max_workers: int = 10,
    verbose: bool = False,
) -> threading.Thread:
    """Launch the compile fleet in the background; returns the joinable
    coordinator thread.  Call early (before host-side param sampling/tree
    building) so compiles overlap host work."""
    import jax

    # touch the backend once on the main thread so plugin init isn't raced
    jax.devices()

    jobs = _jobs_groth16(curve, domain_size, hash_caps)

    def run_one(name, thunk):
        t0 = time.time()
        try:
            thunk()
            _log(verbose, f"{name} ready in {time.time()-t0:.1f}s")
        except Exception as e:  # never let warm-up kill the prover
            _log(True, f"{name} FAILED: {type(e).__name__}: {e}")

    def coordinator():
        threads = []
        for name, thunk in jobs:
            t = threading.Thread(target=run_one, args=(name, thunk), daemon=True)
            t.start()
            threads.append(t)
            while sum(th.is_alive() for th in threads) >= max_workers:
                time.sleep(0.2)
        for t in threads:
            t.join()
        _log(verbose, "all programs ready")

    coord = threading.Thread(target=coordinator, daemon=True)
    coord.start()
    return coord
