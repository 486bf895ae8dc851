"""Groth16 prover v2: limb-major kernels, static scalar classes, few dispatches.

Drives the round-4 compute stack (fields.lm / msm.straus / ntt.lm) against
the same ProvingKey the v1 setup produces.  Pipeline per proof (reference
call stack: /root/reference — ark-groth16 prove, SURVEY.md section 3.1):

  host   witness synthesis -> native CSR matvecs (A z, B z, C z)
  device H = coset-NTT pipeline, ONE program, output stays resident
  device ALL FOUR G1 MSMs (a, b1, l, h) as ONE stacked Straus program —
         a (4, n, M) leading-axis batch quadruples the mul-kernel lane
         count (the limb-major mont_mul saturates near 64k lanes) and
         collapses 4 dispatches into 1
  device G2 MSM (b2) + one stacked boolean-class masked reduction
  host   randomized assembly (A, B, C from r, s) + serialization

Static classification: every query's point set is partitioned ONCE (at key
build) into boolean-class lanes (gadget Booleans — witness bits) and
general lanes; each class gets padded power-of-two planes, so proofs never
gather or classify on device.  Zero-padded lanes select table entry 0
(the projective identity) and vanish.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv
from zkmember_tpu.fields import lm
from zkmember_tpu.curves import device as cdv
from zkmember_tpu.msm import straus
from zkmember_tpu.ntt import lm as nttlm
from zkmember_tpu.r1cs.cs import ConstraintSystem
from zkmember_tpu.snark import groth16
from zkmember_tpu.utils import rng as frng


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _sw_ops_lm(cfg: "groth16.PairingConfig", g2: bool):
    """Limb-major SWOps for a pairing config's G1/G2 (cached by name)."""
    curve = cfg.mod.G2 if g2 else cfg.mod.G1
    name = f"{cfg.name}_{'g2' if g2 else 'g1'}/lm"
    if name in cdv._SW_OPS:
        return cdv._SW_OPS[name]
    if g2 and cfg.name == "bls12_381":
        F = lm.Fp2OpsLM(dv.BLS_FQ2)
    else:
        F = lm.FpOpsLM(cfg.F1.spec if not g2 else cfg.F2.spec)
    import zkmember_tpu.msm.msm as msmmod

    b = curve.b
    if hasattr(b, "coeffs"):
        p = cfg.F2.spec.base.p
        b3 = tuple(msmmod._small_signed(int(c.v) * 3 % p, p) for c in b.coeffs)
    else:
        p = b.__class__.p
        b3 = msmmod._small_signed(int(b.v) * 3 % p, p)
    return cdv.sw_ops_for(F, b3, name)


def _pad_lanes(arr: np.ndarray, B: int) -> np.ndarray:
    b = arr.shape[-1]
    if b == B:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, B - b)]
    return np.pad(arr, pad)


def _planes(pa, take, limb_major=True):
    """PointArray rows (host or device) -> limb-major numpy coord planes."""

    def conv(c):
        if isinstance(c, tuple):
            return tuple(conv(ci) for ci in c)
        c = np.asarray(c)[take]
        return np.swapaxes(c, -1, -2) if limb_major else c

    return conv(pa.x), conv(pa.y)


def _stack_pad(plane_list, B):
    """[(n, b_i)] -> (k, n, B) zero-padded stacked jnp array."""
    if isinstance(plane_list[0], tuple):  # Fp2: stack per component
        return tuple(
            jnp.stack([jnp.asarray(_pad_lanes(p[i], B)) for p in plane_list])
            for i in range(2)
        )
    return jnp.stack([jnp.asarray(_pad_lanes(p, B)) for p in plane_list])


class Groth16KeysLM:
    """Limb-major proving-key planes + static scalar classes for prove().

    Built from the v1 ProvingKey (device- or checkpoint-resident) plus the
    circuit's boolean-variable set."""

    def __init__(self, pk: "groth16.ProvingKey", cs: ConstraintSystem, min_lanes: int = 1,
                 min_bool_lanes: int = 1, min_g2_lanes: int = 1, min_g2b_lanes: int = 1,
                 precompute: bool = True, merge_bool: bool = True):
        """min_lanes: pad every lane count to at least this (power of two);
        set to the mesh 'msm' axis size for sharded proving so every plane
        divides evenly across devices.

        min_bool_lanes / min_g2_lanes / min_g2b_lanes: pin the Bb / B2g /
        B2b paddings up to a common power of two so circuits of different
        sizes share ONE compiled program set per domain size — the grid
        bench pins them to the grid-wide maxima (remote compiles on the
        axon backend cost minutes per program, SURVEY.md section 5.8)."""
        self.pk = pk
        cfg = groth16.pairing_config(pk.curve)
        self.cfg = cfg
        self.ops1 = _sw_ops_lm(cfg, g2=False)
        self.ops2 = _sw_ops_lm(cfg, g2=True)
        self.fr = cfg.fr_spec
        self.nwin = (cfg.r.bit_length() + straus.WINDOW_BITS - 1) // straus.WINDOW_BITS
        self.domain_lm = nttlm.DomainLM.get(self.fr, pk.domain_size)
        M = pk.domain_size
        self.M = M

        # merge_bool: fold the boolean-scalar witness class into the general
        # Straus lanes (0/1 scalars select table entries 0/1) instead of
        # running separate masked-reduction programs.  With the fused
        # select+reduce kernel the marginal lane cost (~17% of the witness)
        # is far below the cost of two extra programs: 2 compiles in every
        # warm-up, 2 extra dispatch+readback rounds per proof.
        boolean = frozenset() if merge_bool else cs.boolean_vars
        ni = pk.num_instance

        def split(nz, to_abs=lambda i: i):
            gen = [i for i in nz if to_abs(i) not in boolean]
            boo = [i for i in nz if to_abs(i) in boolean]
            pos = {v: k for k, v in enumerate(nz)}
            return (
                np.asarray(gen, np.int64),
                np.asarray(boo, np.int64),
                np.asarray([pos[i] for i in gen], np.int64),
                np.asarray([pos[i] for i in boo], np.int64),
            )

        a_gen, a_boo, a_gt, a_bt = split(pk.a_nonzero)
        b_gen, b_boo, b_gt, b_bt = split(pk.b_nonzero)
        l_gen, l_boo, l_gt, l_bt = split(pk.l_nonzero, to_abs=lambda i: i + ni)

        # -- stacked G1 general planes: rows [a, b1, l, h], lanes = M --------
        ax, ay = _planes(pk.a_query, a_gt)
        bx, by = _planes(pk.b_g1_query, b_gt)
        lx, ly = _planes(pk.l_query, l_gt)
        hx, hy = _planes(pk.h_query, np.arange(len(pk.h_query)))
        self.g1_X = _stack_pad([ax, bx, lx, hx], M)
        self.g1_Y = _stack_pad([ay, by, ly, hy], M)
        # absolute z columns per general row (h row has no z gather)
        self.gen_cols = [a_gen, b_gen, l_gen + ni]

        # -- stacked G1 boolean planes: rows [a, b1, l] ----------------------
        Bb = max(min_lanes, min_bool_lanes,
                 _next_pow2(max(len(a_bt), len(b_bt), len(l_bt), 1)))
        self.Bb = Bb
        abx, aby = _planes(pk.a_query, a_bt)
        bbx, bby = _planes(pk.b_g1_query, b_bt)
        lbx, lby = _planes(pk.l_query, l_bt)
        self.g1b_X = _stack_pad([abx, bbx, lbx], Bb)
        self.g1b_Y = _stack_pad([aby, bby, lby], Bb)
        self.bool_cols = [a_boo, b_boo, l_boo + ni]
        self.has_bool = any(len(c) for c in (a_boo, b_boo, l_boo))

        # -- G2 (b-query) ----------------------------------------------------
        B2g = max(min_lanes, min_g2_lanes, _next_pow2(max(len(b_gt), 1)))
        B2b = max(min_lanes, min_g2b_lanes, _next_pow2(max(len(b_bt), 1)))
        g2x, g2y = _planes(pk.b_g2_query, b_gt)
        g2bx, g2by = _planes(pk.b_g2_query, b_bt)

        def jpad(c, B):
            if isinstance(c, tuple):
                return tuple(jpad(ci, B) for ci in c)
            return jnp.asarray(_pad_lanes(c, B))

        self.g2_X, self.g2_Y = jpad(g2x, B2g), jpad(g2y, B2g)
        self.g2b_X, self.g2b_Y = jpad(g2bx, B2b), jpad(g2by, B2b)
        self.B2g, self.B2b = B2g, B2b
        self.b_gen_cols, self.b_bool_cols = b_gen, b_boo

        # window-group factors: target ~128k effective lanes in the window
        # reductions (the mont_mul saturation point); W=64 divides by <=8.
        # Grouping multiplies the scan-body graph size by g, so skip it
        # below 4k lanes where occupancy is irrelevant (tiny/dryrun shapes
        # paid 8x the XLA compile time for nothing — round-4 MULTICHIP
        # timeout).
        def wg(lead_lanes: int) -> int:
            g = 1
            while (
                g < 8
                and (1 << 12) <= lead_lanes * g < (1 << 17)
                and self.nwin % (g * 2) == 0
            ):
                g *= 2
            return g

        self.wgroup_g1 = wg(4 * M)
        self.wgroup_g2 = wg(B2g)

        # -- precomputed Straus tables (single-chip fast path) ---------------
        # Tables depend only on the key points: build once here, and the
        # per-proof G1x4 MSM runs as ONE fused Pallas select+reduce kernel
        # (msm.pallas_msm) instead of ~4M XLA-composed complete adds.
        # Memory: 48x the point planes (16 entries x 3 projective coords) —
        # ~300 MB at M=2^14, so gate on a lane budget (chunked giant domains
        # keep the on-the-fly path).
        import os

        self._g1_tab = None
        self._g2_tab = None
        max_tab_lanes = int(os.environ.get("ZKMEMBER_TAB_LANES", str(1 << 19)))
        self._want_g1_tab = (
            precompute
            and straus.precomp_supported(self.ops1, M)
            and 4 * M <= max_tab_lanes
        )
        self._want_g2_tab = (
            precompute
            and straus.precomp_supported(self.ops2, B2g)
            and B2g <= max_tab_lanes // 2  # Fp2: 2x the planes per lane
        )

    def build_tables(self):
        """Build the precomputed Straus tables (compile + one execution);
        called from warm()'s thread pool so the table-program compile
        overlaps the proof-program compiles instead of blocking key
        construction."""
        if self._want_g1_tab and self._g1_tab is None:
            self._g1_tab = straus.table_program(self.ops1, self.g1_X, self.g1_Y)
        if self._want_g2_tab and self._g2_tab is None:
            self._g2_tab = straus.table_program(self.ops2, self.g2_X, self.g2_Y)

    @property
    def g1_tab(self):
        if self._want_g1_tab and self._g1_tab is None:
            self._g1_tab = straus.table_program(self.ops1, self.g1_X, self.g1_Y)
        return self._g1_tab

    @property
    def g2_tab(self):
        if self._want_g2_tab and self._g2_tab is None:
            self._g2_tab = straus.table_program(self.ops2, self.g2_X, self.g2_Y)
        return self._g2_tab

    def _tab_zeros(self, g2: bool = False):
        """Zero arrays with the table shapes (for warm-up compiles)."""

        def z(c):
            if isinstance(c, tuple):
                return tuple(z(ci) for ci in c)
            return jnp.zeros((16,) + c.shape, jnp.uint32)

        X, Y = (self.g2_X, self.g2_Y) if g2 else (self.g1_X, self.g1_Y)
        return (z(X), z(Y), z(X))


@jax.jit
def _pack_program(leaves):
    """Concatenate device arrays into ONE u32 vector for a single host
    fetch (each np.asarray on the axon backend costs ~20-60 ms RPC)."""
    return jnp.concatenate([jnp.ravel(l) for l in leaves])


def _z_rows16(cs: ConstraintSystem, fr: dv.FieldSpec) -> np.ndarray:
    """Witness vector as (n_limbs16, n_vars) canonical u32 planes."""
    from zkmember_tpu import native as zknative

    nl64 = (fr.n + 3) // 4
    rows = zknative.ints_to_u64(cs.values, nl64)  # (V, nl64) LE u64
    u16 = rows.view("<u2").astype(np.uint32)[:, : fr.n]  # (V, n)
    return np.ascontiguousarray(u16.T)


def warm(keys: Groth16KeysLM, verbose: bool = False):
    """Compile the proof's device programs in PARALLEL threads.

    The axon backend compiles remotely with high, variable latency
    (5..300 s per program) and its persistent compile cache does not hit
    across processes, so a cold prove would pay ~5 serial remote compiles.
    XLA compilation releases the GIL (it is an RPC on this backend): firing
    all programs from a thread pool collapses cold start to ~max(one).
    Blocks until every program is resident."""
    import sys
    import threading
    import time

    import jax

    fr = keys.fr
    dlm = keys.domain_lm
    M = keys.M

    def log(msg, t0):
        if verbose:
            print(f"# [warm] {msg} in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    def zlike(c):
        if isinstance(c, tuple):
            return tuple(zlike(ci) for ci in c)
        return jnp.zeros_like(c)

    def j_g1x4():
        z = jnp.zeros((4, fr.n, M), jnp.uint32)
        if keys._want_g1_tab:
            jax.block_until_ready(
                straus.msm_precomp_program(
                    keys.ops1, keys._tab_zeros(), keys.nwin, z,
                )
            )
            return
        jax.block_until_ready(
            straus.msm_program_chunked(
                keys.ops1, zlike(keys.g1_X), zlike(keys.g1_Y), z, keys.nwin,
                keys.wgroup_g1,
            )
        )

    def j_g1b():
        m = jnp.zeros((3, keys.Bb), jnp.uint32)
        jax.block_until_ready(
            straus.bool_msm_program(keys.ops1, zlike(keys.g1b_X), zlike(keys.g1b_Y), m)
        )

    def j_g2():
        z = jnp.zeros((fr.n, keys.B2g), jnp.uint32)
        if keys._want_g2_tab:
            jax.block_until_ready(
                straus.msm_precomp_program(
                    keys.ops2, keys._tab_zeros(g2=True), keys.nwin, z,
                )
            )
            return
        jax.block_until_ready(
            straus.msm_program_chunked(
                keys.ops2, zlike(keys.g2_X), zlike(keys.g2_Y), z, keys.nwin,
                keys.wgroup_g2, max_lanes=1 << 17,
            )
        )

    def j_g2b():
        m = jnp.zeros((keys.B2b,), jnp.uint32)
        jax.block_until_ready(
            straus.bool_msm_program(keys.ops2, zlike(keys.g2b_X), zlike(keys.g2b_Y), m)
        )

    def j_ntt():
        z = jnp.zeros((fr.n, M), jnp.uint32)
        jax.block_until_ready(nttlm.groth16_h(dlm, z, z, z))

    jobs = [("g1x4", j_g1x4), ("g2", j_g2), ("ntt_h", j_ntt),
            ("tables", keys.build_tables)]
    if keys.has_bool:
        jobs += [("g1bool", j_g1b), ("g2bool", j_g2b)]
    threads = []
    for name, fn in jobs:
        def run(name=name, fn=fn):
            t0 = time.time()
            try:
                fn()
                log(f"{name} ready", t0)
            except Exception as e:  # pragma: no cover - warm-up must not kill prove
                print(f"# [warm] {name} FAILED: {e}", file=sys.stderr, flush=True)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        threads.append(t)
    for t in threads:
        t.join()


def warm_sharded(keys: Groth16KeysLM, mesh, verbose: bool = False):
    """Compile the SHARDED proof programs (mesh 'msm' axis) in parallel
    threads — the multi-chip counterpart of warm(); used by the driver's
    dryrun so program compiles overlap instead of serializing inside the
    first prove."""
    import sys
    import threading
    import time

    import jax

    fr = keys.fr
    M = keys.M

    def log(msg, t0):
        if verbose:
            print(f"# [warm-sh] {msg} in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    def zlike(c):
        if isinstance(c, tuple):
            return tuple(zlike(ci) for ci in c)
        return jnp.zeros_like(c)

    jobs = [
        ("g1x4", lambda: jax.block_until_ready(
            straus.sharded_msm_program(
                keys.ops1, mesh, zlike(keys.g1_X), zlike(keys.g1_Y),
                jnp.zeros((4, fr.n, M), jnp.uint32), keys.nwin, keys.wgroup_g1))),
        ("g2", lambda: jax.block_until_ready(
            straus.sharded_msm_program(
                keys.ops2, mesh, zlike(keys.g2_X), zlike(keys.g2_Y),
                jnp.zeros((fr.n, keys.B2g), jnp.uint32), keys.nwin,
                keys.wgroup_g2))),
        ("ntt_h", lambda: jax.block_until_ready(
            nttlm.groth16_h(keys.domain_lm, *(jnp.zeros((fr.n, M), jnp.uint32),) * 3))),
    ]
    if keys.has_bool:
        jobs += [
            ("g1bool", lambda: jax.block_until_ready(
                straus.sharded_bool_msm_program(
                    keys.ops1, mesh, zlike(keys.g1b_X), zlike(keys.g1b_Y),
                    jnp.zeros((3, keys.Bb), jnp.uint32)))),
            ("g2bool", lambda: jax.block_until_ready(
                straus.sharded_bool_msm_program(
                    keys.ops2, mesh, zlike(keys.g2b_X), zlike(keys.g2b_Y),
                    jnp.zeros((keys.B2b,), jnp.uint32)))),
        ]
    threads = []
    for name, fn in jobs:
        def run(name=name, fn=fn):
            t0 = time.time()
            try:
                fn()
                log(f"{name} ready", t0)
            except Exception as e:  # pragma: no cover
                print(f"# [warm-sh] {name} FAILED: {e}", file=sys.stderr, flush=True)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        threads.append(t)
    for t in threads:
        t.join()


def prove_batch(keys: Groth16KeysLM, cs_list, rng=None):
    """P independent proofs over the SAME proving key through ONE batched
    kernel invocation per MSM family — the dp (data-parallel) axis of
    BASELINE's proofs/sec metric.  Requires precomputed tables (single-chip
    TPU fast path) and merged boolean lanes; use prove() otherwise.

    The batched select+reduce kernel reads the shared Straus tables once
    per tile per proof from HBM (~µs) while every proof's windows run at
    full VPU occupancy, so marginal cost per proof is the pure window work
    — fixed overheads (dispatch, fori prologues, narrow tails, host
    readback RPC) amortize across the batch."""
    from zkmember_tpu import native as zknative

    assert keys.g1_tab is not None and keys.g2_tab is not None, (
        "prove_batch needs precomputed tables (TPU path)"
    )
    assert not keys.has_bool, "prove_batch requires merge_bool keys"
    pk = keys.pk
    cfg = keys.cfg
    r_mod = cfg.r
    g1, g2 = cfg.mod.G1, cfg.mod.G2
    rng = rng or frng.secure_rng()
    fr = keys.fr
    M = keys.M
    P = len(cs_list)
    nf = zknative.NativeField.get(fr.p, fr.n)
    randomizers = [
        (frng.field_element(rng, r_mod), frng.field_element(rng, r_mod))
        for _ in range(P)
    ]

    dabc = []
    zqs, z2s = [], []
    for cs in cs_list:
        if nf is not None:
            da, db, dc, _ = groth16._matrix_evals_native(cs, M, nf)
            rows = [np.asarray(lm.to_lm(x)) for x in (da, db, dc)]
        else:
            a_ev, b_ev, c_ev = groth16._matrix_evals(cs, M)
            rows = [
                np.asarray(lm.to_lm(fr.to_mont_host(v)))
                for v in (a_ev, b_ev, c_ev)
            ]
        dabc.append(np.stack(rows))
        z16 = _z_rows16(cs, fr)
        zqs.append(np.stack([_pad_lanes(z16[:, cols], M) for cols in keys.gen_cols]))
        z2s.append(_pad_lanes(z16[:, keys.b_gen_cols], keys.B2g))

    h_limbs = nttlm.groth16_h_batch(keys.domain_lm, jnp.asarray(np.stack(dabc)))
    z4 = jnp.concatenate(
        [jnp.asarray(np.stack(zqs)), h_limbs[:, None]], axis=1
    )  # (P, 4, nl, M)
    z2 = jnp.asarray(np.stack(z2s))  # (P, nl, B2g)

    out4 = straus.msm_precomp_batch(keys.ops1, keys.g1_tab, keys.nwin, z4)
    out2 = straus.msm_precomp_batch(keys.ops2, keys.g2_tab, keys.nwin, z2)

    leaves, treedef = jax.tree.flatten((out4, out2))
    host = np.asarray(_pack_program(tuple(leaves)))
    sizes = [int(np.prod(l.shape)) for l in leaves]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    np_leaves = [
        host[offs[i] : offs[i + 1]].reshape(tuple(leaves[i].shape))
        for i in range(len(leaves))
    ]
    out4h, out2h = jax.tree.unflatten(treedef, np_leaves)

    proofs = []
    for p in range(P):
        a_gen, b1_gen, l_gen, h_acc = (
            straus.projective_to_host(
                None, g1,
                tuple(straus._row(straus._row(c, p), i) for c in out4h),
            )
            for i in range(4)
        )
        b2_acc = straus.projective_to_host(
            None, g2, tuple(straus._row(c, p) for c in out2h)
        )
        rr, ss = randomizers[p]
        A = g1.add(g1.add(pk.vk.alpha_g1, a_gen), g1.mul(rr, pk.delta_g1))
        B2 = g2.add(g2.add(pk.vk.beta_g2, b2_acc), g2.mul(ss, pk.vk.delta_g2))
        B1 = g1.add(g1.add(pk.beta_g1, b1_gen), g1.mul(ss, pk.delta_g1))
        C = g1.add(l_gen, h_acc)
        C = g1.add(C, g1.mul(ss, A))
        C = g1.add(C, g1.mul(rr, B1))
        C = g1.add(C, g1.mul((-rr * ss) % r_mod, pk.delta_g1))
        proofs.append(groth16.Proof(curve=pk.curve, a=A, b=B2, c=C))
    return proofs


def prove(keys: Groth16KeysLM, cs: ConstraintSystem, rng=None, mesh=None) -> "groth16.Proof":
    """Groth16 prove on the limb-major stack (drop-in for groth16.prove).

    mesh: optional jax Mesh with an 'msm' axis — shards every proof MSM's
    point lanes across devices (msm.straus.sharded_msm_program); build the
    keys with min_lanes = mesh axis size.  The H NTT pipeline stays
    single-device (its per-proof cost is ~1% of the MSMs)."""
    import os
    import sys

    from zkmember_tpu import native as zknative
    from zkmember_tpu.utils import obs

    prof = obs.Profiler(
        emit=(lambda s: print(f"# {s}", file=sys.stderr, flush=True))
        if os.environ.get("ZKMEMBER_TRACE")
        else None
    )
    pk = keys.pk
    cfg = keys.cfg
    r_mod = cfg.r
    g1, g2 = cfg.mod.G1, cfg.mod.G2
    # default to OS entropy for the proof randomizers r, s: a deterministic
    # default silently voids zero-knowledge across proofs (round-4 advisor)
    rng = rng or frng.secure_rng()
    rr = frng.field_element(rng, r_mod)
    ss = frng.field_element(rng, r_mod)
    fr = keys.fr
    M = keys.M
    nf = zknative.NativeField.get(fr.p, fr.n)

    # ZKMEMBER_SYNC_PHASES=1: force a tiny readback after each phase so the
    # trace attributes time truthfully (async dispatch otherwise piles all
    # device time into the first readback phase; block_until_ready does not
    # actually block on the axon backend)
    sync_phases = os.environ.get("ZKMEMBER_SYNC_PHASES")

    def _sync(x):
        if sync_phases:
            import jax as _jax

            for leaf in _jax.tree.leaves(x):
                np.asarray(leaf[..., :1, :1])
                break

    with prof.phase("matrix_evals"):
        if nf is not None:
            da, db, dc, _ = groth16._matrix_evals_native(cs, M, nf)
            da, db, dc = (lm.to_lm(x) for x in (da, db, dc))
        else:
            a_ev, b_ev, c_ev = groth16._matrix_evals(cs, M)
            da = lm.to_lm(fr.to_mont_host(a_ev))
            db = lm.to_lm(fr.to_mont_host(b_ev))
            dc = lm.to_lm(fr.to_mont_host(c_ev))

    with prof.phase("h_pipeline"):
        h_limbs = nttlm.groth16_h(keys.domain_lm, da, db, dc)  # (n, M) canonical
        _sync(h_limbs)

    with prof.phase("witness_planes"):
        z16 = _z_rows16(cs, fr)
        zq = np.stack(
            [_pad_lanes(z16[:, cols], M) for cols in keys.gen_cols]
        )  # (3, nl, M)
        z4 = jnp.concatenate([jnp.asarray(zq), h_limbs[None]], axis=0)
        z2 = jnp.asarray(_pad_lanes(z16[:, keys.b_gen_cols], keys.B2g))
        if keys.has_bool:
            bmask = np.stack(
                [
                    _pad_lanes(z16[0, cols].astype(np.uint32), keys.Bb)
                    for cols in keys.bool_cols
                ]
            )  # (3, Bb)
            b2mask = jnp.asarray(
                _pad_lanes(z16[0, keys.b_bool_cols].astype(np.uint32), keys.B2b)
            )
        _sync(z4)

    if mesh is None:
        run_msm = lambda ops, X, Y, z, wg, ml=1 << 18: straus.msm_program_chunked(
            ops, X, Y, z, keys.nwin, wg, max_lanes=ml
        )
        run_bool = straus.bool_msm_program
    else:
        run_msm = lambda ops, X, Y, z, wg, ml=None: straus.sharded_msm_program(
            ops, mesh, X, Y, z, keys.nwin, wg
        )
        run_bool = lambda ops, X, Y, m: straus.sharded_bool_msm_program(
            ops, mesh, X, Y, m
        )

    # Dispatch EVERY program before the first host readback: jax dispatch is
    # async, so the device queue pipelines all four MSMs back-to-back while
    # the readbacks below drain them in order — the round-4 version paid 9
    # sequential device->host syncs (VERDICT r4 next-step 2b).
    with prof.phase("msm_dispatch"):
        if mesh is None and keys.g1_tab is not None:
            out4 = straus.msm_precomp_program(keys.ops1, keys.g1_tab, keys.nwin, z4)
        else:
            out4 = run_msm(keys.ops1, keys.g1_X, keys.g1_Y, z4, keys.wgroup_g1)
        _sync(out4)
        if keys.has_bool:
            outb = run_bool(keys.ops1, keys.g1b_X, keys.g1b_Y, jnp.asarray(bmask))
        # Fp2 coordinates double the table footprint: halve the G2 chunk
        if mesh is None and keys.g2_tab is not None:
            out2 = straus.msm_precomp_program(keys.ops2, keys.g2_tab, keys.nwin, z2)
        else:
            out2 = run_msm(keys.ops2, keys.g2_X, keys.g2_Y, z2, keys.wgroup_g2, 1 << 17)
        if keys.has_bool:
            out2b = run_bool(keys.ops2, keys.g2b_X, keys.g2b_Y, b2mask)
            _sync(outb)
            _sync(out2b)
        _sync(out2)

    # ONE device->host fetch for every accumulator: each np.asarray on the
    # axon backend pays ~20-60 ms of RPC latency, so the previous 27
    # per-coordinate readbacks cost ~0.8 s of the 2.4 s proof (round-5
    # synced trace); pack every projective output into a single u32 vector
    # on device and parse on host.
    with prof.phase("fetch"):
        parts = (out4, out2) + ((outb, out2b) if keys.has_bool else ())
        leaves, treedef = jax.tree.flatten(parts)
        host = np.asarray(_pack_program(tuple(leaves)))
    with prof.phase("parse"):
        sizes = [int(np.prod(l.shape)) for l in leaves]
        offs = np.concatenate([[0], np.cumsum(sizes)])
        np_leaves = [
            host[offs[i] : offs[i + 1]].reshape(tuple(leaves[i].shape))
            for i in range(len(leaves))
        ]
        unpacked = jax.tree.unflatten(treedef, np_leaves)
        out4h, out2h = unpacked[0], unpacked[1]
        a_gen, b1_gen, l_gen, h_acc = (
            straus.projective_to_host(None, g1, tuple(straus._row(c, i) for c in out4h))
            for i in range(4)
        )
        b2_gen = straus.projective_to_host(None, g2, out2h)
        if keys.has_bool:
            outbh, out2bh = unpacked[2], unpacked[3]
            a_boo, b1_boo, l_boo = (
                straus.projective_to_host(
                    None, g1, tuple(straus._row(c, i) for c in outbh)
                )
                for i in range(3)
            )
            b2_boo = straus.projective_to_host(None, g2, out2bh)
        else:
            a_boo = b1_boo = l_boo = b2_boo = None

    with prof.phase("assemble"):
        a_acc = g1.add(a_gen, a_boo)
        b1_acc = g1.add(b1_gen, b1_boo)
        l_acc = g1.add(l_gen, l_boo)
        b2_acc = g2.add(b2_gen, b2_boo) if b2_boo is not None else b2_gen
        A = g1.add(g1.add(pk.vk.alpha_g1, a_acc), g1.mul(rr, pk.delta_g1))
        B2 = g2.add(g2.add(pk.vk.beta_g2, b2_acc), g2.mul(ss, pk.vk.delta_g2))
        B1 = g1.add(g1.add(pk.beta_g1, b1_acc), g1.mul(ss, pk.delta_g1))
        C = l_acc
        C = g1.add(C, h_acc)
        C = g1.add(C, g1.mul(ss, A))
        C = g1.add(C, g1.mul(rr, B1))
        C = g1.add(C, g1.mul((-rr * ss) % r_mod, pk.delta_g1))
    if prof._emit is not None:
        # roofline accounting per MSM phase (BASELINE.json speed-of-light
        # requirement): u32-mult work vs wall time vs kernel/VPU peaks
        import sys as _sys

        summ = prof.summary()
        nl = fr.n
        nbits = r_mod.bit_length()
        g1_work = 4 * obs.straus_msm_work(M, nl, nbits)
        g2_work = obs.straus_msm_work(
            keys.B2g, nl, nbits, fp2=pk.curve == "bls12_381"
        )
        for metric, work, phase in (
            ("msm_all", g1_work + g2_work, "msm_dispatch"),
        ):
            if phase in summ:
                print(
                    "# " + obs.throughput_line(metric, work, summ[phase]),
                    file=_sys.stderr,
                    flush=True,
                )
        prof.dump()
    return groth16.Proof(curve=pk.curve, a=A, b=B2, c=C)
