"""Groth16: circuit-specific setup, TPU prover, host verifier.

Capability parity with `ark-groth16`'s {circuit_specific_setup, prove,
verify} as the reference drives them
(/root/reference/src/commitments/pedersen381/mod.rs:60-71, SURVEY.md
section 3.1).  Works over any pairing stack exposing the PairingConfig
protocol below (BLS12-381 and BW6-761 shipped).

Host/device split (SURVEY.md section 3.1 footer):
  host   — toxic-waste sampling, QAP evaluation at tau (sparse, bignum),
           transcript/serialization, the O(1) pairing verifier;
  device — key-element fixed-base scalar muls, the NTT pipeline for H(x),
           and all proof MSMs (scalar-classified; see zkmember_tpu.msm).

R1CS -> QAP uses the libsnark/ark construction: the evaluation domain is
sized to num_constraints + num_instance and each instance variable i gets
an extra Lagrange term L_{nc+i} added to its A-polynomial, which pins the
public inputs inside the QAP (prevents input malleability).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv
from zkmember_tpu.curves import device as cdv
import zkmember_tpu.msm.msm as msmmod
from zkmember_tpu import ntt as nttmod
from zkmember_tpu.r1cs.cs import ConstraintSystem
from zkmember_tpu.utils import rng as frng


# ---------------------------------------------------------------------------
# pairing stack configs
# ---------------------------------------------------------------------------


class PairingConfig:
    """Everything Groth16 needs to know about a pairing-friendly curve."""

    def __init__(self, name, fr_spec, g1_field_ops, g2_field_ops, mod):
        self.name = name
        self.fr_spec = fr_spec  # device spec of the scalar field
        self.F1 = g1_field_ops
        self.F2 = g2_field_ops
        self.mod = mod  # host curve module (G1, G2, pairing, ...)
        self.r = mod.R

    def g1_from_host(self, pts):
        return msmmod.g1_points_from_host(self.F1.spec, self.mod.G1, pts)

    def g2_from_host(self, pts):
        # G2 coordinates live in Fq2 (BLS12-381) or the base field (BW6-761,
        # whose twist is defined over Fq) — dispatch on the ops vtable.
        if isinstance(self.F2, dv.Fp2Ops):
            return msmmod.g2_points_from_host(self.F2.spec, self.mod.G2, pts)
        return msmmod.g1_points_from_host(self.F2.spec, self.mod.G2, pts)


class _BLSConfig(PairingConfig):
    def __init__(self):
        from zkmember_tpu.curves import bls12_381 as mod

        super().__init__(
            "bls12_381", dv.BLS_FR, dv.FpOps(dv.BLS_FQ), dv.Fp2Ops(dv.BLS_FQ2), mod
        )


class _BW6Config(PairingConfig):
    def __init__(self):
        from zkmember_tpu.curves import bw6_761 as mod

        # BW6's G2 also lives over the base field Fq — same ops vtable.
        super().__init__(
            "bw6_761", dv.BW6_FR, dv.FpOps(dv.BW6_FQ), dv.FpOps(dv.BW6_FQ), mod
        )


_CONFIGS: dict = {}


def pairing_config(name: str) -> PairingConfig:
    if name not in _CONFIGS:
        _CONFIGS[name] = _BLSConfig() if name == "bls12_381" else _BW6Config()
    return _CONFIGS[name]


# ---------------------------------------------------------------------------
# QAP evaluation at tau (host bignum; sparse)
# ---------------------------------------------------------------------------


def _batch_inverse(vals, p):
    """Montgomery's trick: n inversions for one inversion + 3n mults."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % p
    inv_all = pow(prefix[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % p
        inv_all = inv_all * vals[i] % p
    return out


def qap_evaluate_at(cs: ConstraintSystem, domain: nttmod.Domain, tau: int):
    """u_i(tau), v_i(tau), w_i(tau) per variable + Z(tau).

    Lagrange basis L_j(tau) = Z(tau)/M * w^j / (tau - w^j); instance rows
    append L_{nc+i} into u_i (input consistency).
    """
    p = cs.p
    M = domain.size
    nc, ni, nv = cs.num_constraints, cs.num_instance, cs.num_variables
    assert nc + ni <= M
    z_tau = (pow(tau, M, p) - 1) % p
    assert z_tau != 0, "tau hit the domain (resample)"
    wj = [1] * M
    for j in range(1, M):
        wj[j] = wj[j - 1] * domain.w % p
    denoms = _batch_inverse([(tau - w) % p for w in wj], p)
    zm = z_tau * pow(M, -1, p) % p
    L = [zm * wj[j] % p * denoms[j] % p for j in range(M)]

    u = [0] * nv
    v = [0] * nv
    w = [0] * nv
    for j in range(nc):
        lj = L[j]
        for i, c in cs.A[j].items():
            u[i] = (u[i] + c * lj) % p
        for i, c in cs.B[j].items():
            v[i] = (v[i] + c * lj) % p
        for i, c in cs.C[j].items():
            w[i] = (w[i] + c * lj) % p
    for i in range(ni):
        u[i] = (u[i] + L[nc + i]) % p
    return u, v, w, z_tau


# ---------------------------------------------------------------------------
# fixed-base batched scalar mul on device (key generation)
# ---------------------------------------------------------------------------


_FIXED_TABLES: dict = {}


def _fixed_base_table(cfg, base_host, curve, g2: bool):
    """Host-precomputed (n_windows, 16) table: table[w][d] = d * 16^w * G,
    shipped once as device projective planes.  d=0 rows are the projective
    identity class (X=0, Z=0, any Y != 0 — on the a=0 curve, Z=0 forces
    X=0, and the complete law treats every (0, y, 0) as identity)."""
    key = (cfg.name, g2)
    if key not in _FIXED_TABLES:
        r = cfg.r
        c = msmmod.WINDOW_BITS
        nwin = (r.bit_length() + c - 1) // c
        flat = []
        step = base_host
        for _ in range(nwin):
            acc = None
            for d in range(1 << c):
                flat.append(acc)  # d * 16^w * G (None for d=0)
                acc = curve.add(acc, step) if acc is not None else step
            for _ in range(c):
                step = curve.double(step)
        inf_mask = np.array([p is None for p in flat], np.uint32)
        pts = [base_host if p is None else p for p in flat]
        tbl = cfg.g2_from_host(pts) if g2 else cfg.g1_from_host(pts)
        F = cfg.F2 if g2 else cfg.F1
        m = jnp.asarray(inf_mask) != 0
        zero = F.zeros((len(pts),))
        X = F.select(m, zero, tbl.x)
        Z = F.select(m, zero, F.ones((len(pts),)))
        nw, T = nwin, 1 << c

        def resh(cc):
            if isinstance(cc, tuple):
                return tuple(resh(ci) for ci in cc)
            return cc.reshape((nw, T) + cc.shape[1:])

        _FIXED_TABLES[key] = (resh(X), resh(tbl.y), resh(Z), nwin)
    return _FIXED_TABLES[key]


def _fixed_base_mul_device(cfg, F, base_host, curve, scalars, g2=False):
    """[s*G for s in scalars] on device affine Montgomery planes.

    Fully-tabled windowed method: the per-window digit tables d * 16^w * G
    are host-precomputed constants, so each point costs only n_windows
    batched additions — no doublings at all (the setup hot loop).  Work is
    chunked to the canonical MSM tile so the kernel compiles once per field
    (remote-compile latency on the axon backend dominates cold setup
    otherwise), and results STAY on device (x, y, inf_mask) — no host
    bignum round trip.
    """
    r = cfg.r
    if not scalars:
        return None, None, np.zeros((0,), bool)
    TX, TY, TZ, nwin = _fixed_base_table(cfg, base_host, curve, g2)
    ops = msmmod.sw_ops_for_curve(F, curve)
    B = len(scalars)
    T = msmmod.tile()
    c = msmmod.WINDOW_BITS
    dg = msmmod.scalars_to_digits_np([s % r for s in scalars], nwin * c)
    dg = dg[:, ::-1]  # LSW first to match table window order
    xs, ys, infs = [], [], []
    for s, e in msmmod._chunks(B, T):
        digits = np.zeros((T, nwin), np.uint32)
        digits[: e - s] = dg[s:e]
        J = _fixed_base_kernel(ops, jnp.asarray(digits), TX, TY, TZ)
        x, y, inf = msmmod._affine_tile_kernel(ops, *J)
        xs.append(x)
        ys.append(y)
        infs.append(np.asarray(inf)[: e - s])
    x = _concat_trim(xs, B)
    y = _concat_trim(ys, B)
    return x, y, np.concatenate(infs)


def _concat_trim(cs, B: int):
    if isinstance(cs[0], tuple):
        return tuple(_concat_trim([c[i] for c in cs], B) for i in range(len(cs[0])))
    out = cs[0] if len(cs) == 1 else jnp.concatenate(cs, axis=0)
    return out[:B]


def _fixed_base_mul(cfg, F, base_host, curve, scalars, g2=False):
    """[s*G for s in scalars] -> host affine point list (small batches)."""
    if not scalars:
        return []
    x, y, inf = _fixed_base_mul_device(cfg, F, base_host, curve, scalars, g2)
    return _affine_to_host(cfg, F, curve, x, y, inf, len(scalars))


from functools import partial


@partial(jax.jit, static_argnums=(0,))
def _fixed_base_kernel(ops, digits, TX, TY, TZ):
    """digits: (B, nwin) LSW-first; T*: (nwin, 16) projective window tables.
    Complete-law adds (curves.device.swp_add): digit-0 table rows are the
    identity class, so no masking is needed anywhere."""
    B = digits.shape[0]
    acc0 = cdv.swp_identity(ops, (B,))

    def body(acc, xs):
        tx, ty, tz, dig = xs  # tables (16, ...), digits (B,)
        Q = (
            cdv._gather_coord(_bcast_mid(tx, B), dig),
            cdv._gather_coord(_bcast_mid(ty, B), dig),
            cdv._gather_coord(_bcast_mid(tz, B), dig),
        )
        return cdv.swp_add(ops, acc, Q), None

    acc, _ = jax.lax.scan(
        body, acc0, (TX, TY, TZ, jnp.moveaxis(digits, 0, 1))
    )
    return acc


def _bcast_mid(c, B):
    """(16, n...) table coord -> (16, B, n...) broadcast for per-point gather."""
    if isinstance(c, tuple):
        return tuple(_bcast_mid(ci, B) for ci in c)
    return jnp.broadcast_to(c[:, None], (c.shape[0], B) + c.shape[1:])


def _affine_to_host(cfg, F, curve, x, y, inf, count):
    infs = np.asarray(inf)[:count]
    if isinstance(x, tuple):  # Fp2 coordinates
        base = dv.BLS_FQ
        x0 = base.from_mont_host(np.asarray(x[0])[:count])
        x1 = base.from_mont_host(np.asarray(x[1])[:count])
        y0 = base.from_mont_host(np.asarray(y[0])[:count])
        y1 = base.from_mont_host(np.asarray(y[1])[:count])
        f2 = curve.field
        fq = f2.base
        return [
            None
            if infs[i]
            else ((f2(fq(x0[i]), fq(x1[i]))), (f2(fq(y0[i]), fq(y1[i]))))
            for i in range(count)
        ]
    spec = F.spec
    xs = spec.from_mont_host(np.asarray(x)[:count])
    ys = spec.from_mont_host(np.asarray(y)[:count])
    return [
        None if infs[i] else (curve.field(xs[i]), curve.field(ys[i]))
        for i in range(count)
    ]


# ---------------------------------------------------------------------------
# keys / proof containers
# ---------------------------------------------------------------------------


@dataclass
class VerifyingKey:
    curve: str
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    gamma_abc_g1: list  # host affine, len = num_instance


@dataclass
class ProvingKey:
    curve: str
    vk: VerifyingKey
    beta_g1: tuple
    delta_g1: tuple
    a_query: "msmmod.PointArray"  # u_i(tau) G1, all vars (device)
    b_g1_query: "msmmod.PointArray"
    b_g2_query: "msmmod.PointArray"
    h_query: "msmmod.PointArray"  # tau^k Z/delta G1, k < M-1
    l_query: "msmmod.PointArray"  # witness vars with nonzero L scalar only
    a_nonzero: list  # indices where u_i != 0 (zero points dropped on device)
    b_nonzero: list
    l_nonzero: list  # witness-relative indices with nonzero L scalar
    domain_size: int
    num_instance: int


@dataclass
class Proof:
    curve: str
    a: tuple  # G1 affine
    b: tuple  # G2 affine
    c: tuple  # G1 affine


# ---------------------------------------------------------------------------
# setup / prove / verify
# ---------------------------------------------------------------------------


def setup(cs: ConstraintSystem, curve: str = "bls12_381", rng=None,
          host: bool = False):
    """circuit_specific_setup (pedersen381/mod.rs:60): sample toxic waste,
    evaluate the QAP at tau, build pk/vk via device fixed-base muls.

    host=True computes the key points with host scalar muls instead of the
    device fixed-base kernels — zero XLA compiles, the right trade for tiny
    circuits (the multichip dryrun's toy circuit has ~20 key points; the
    device-table path costs two compiled kernels at ~60 s each on a CPU
    host, which is what timed out the round-4 MULTICHIP check)."""
    cfg = pairing_config(curve)
    rng = rng or frng.test_rng()
    r = cfg.r
    mod = cfg.mod

    alpha, beta, gamma, delta, tau = (frng.nonzero_field_element(rng, r) for _ in range(5))
    M = msmmod._next_pow2(cs.num_constraints + cs.num_instance)
    domain = nttmod.Domain.get(cfg.fr_spec, M)
    u, v, w, z_tau = qap_evaluate_at(cs, domain, tau)

    ni, nv = cs.num_instance, cs.num_variables
    gamma_inv = pow(gamma, -1, r)
    delta_inv = pow(delta, -1, r)

    g1, g2 = mod.G1, mod.G2
    G, H = mod.G1_GEN, mod.G2_GEN

    # scalar lists
    abc = [(beta * u[i] + alpha * v[i] + w[i]) % r for i in range(nv)]
    gamma_abc = [abc[i] * gamma_inv % r for i in range(ni)]
    l_scalars = [abc[i] * delta_inv % r for i in range(ni, nv)]
    taupow = [1] * (M - 1)
    for k in range(1, M - 1):
        taupow[k] = taupow[k - 1] * tau % r
    h_scalars = [taupow[k] * z_tau % r * delta_inv % r for k in range(M - 1)]

    # nonzero filtering for a/b queries (zeros contribute nothing; keeps the
    # device arrays dense)
    a_nonzero = [i for i in range(nv) if u[i] % r]
    b_nonzero = [i for i in range(nv) if v[i] % r]

    # l-query scalars can legitimately be zero (variable absent from the
    # QAP); zero scalars map to the point at infinity, which the dense
    # affine PointArray cannot represent — filter them like a/b.
    l_nonzero = [i for i in range(len(l_scalars)) if l_scalars[i]]

    F1, F2 = cfg.F1, cfg.F2

    if host:
        def dq(F, base, crv, scalars, g2=False):
            pts = [crv.mul(s % r, base) for s in scalars]
            assert all(p is not None for p in pts)
            return cfg.g2_from_host(pts) if g2 else cfg.g1_from_host(pts)

        gamma_abc_pts = [g1.mul(s % r, G) for s in gamma_abc]
    else:
        def dq(F, base, crv, scalars, g2=False):
            """Device query: fixed-base muls kept as an on-device PointArray."""
            x, y, inf = _fixed_base_mul_device(cfg, F, base, crv, scalars, g2)
            assert not inf.any(), "zero scalar leaked into a dense query"
            return msmmod.PointArray(F, crv, x, y)

        gamma_abc_pts = _fixed_base_mul(cfg, F1, G, g1, gamma_abc)

    a_query = dq(F1, G, g1, [u[i] for i in a_nonzero])
    b_g1_query = dq(F1, G, g1, [v[i] for i in b_nonzero])
    b_g2_query = dq(F2, H, g2, [v[i] for i in b_nonzero], g2=True)
    h_query = dq(F1, G, g1, h_scalars)
    l_query = dq(F1, G, g1, [l_scalars[i] for i in l_nonzero])

    vk = VerifyingKey(
        curve=curve,
        alpha_g1=g1.mul(alpha, G),
        beta_g2=g2.mul(beta, H),
        gamma_g2=g2.mul(gamma, H),
        delta_g2=g2.mul(delta, H),
        gamma_abc_g1=gamma_abc_pts,
    )
    pk = ProvingKey(
        curve=curve,
        vk=vk,
        beta_g1=g1.mul(beta, G),
        delta_g1=g1.mul(delta, G),
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        a_nonzero=a_nonzero,
        b_nonzero=b_nonzero,
        l_nonzero=l_nonzero,
        domain_size=M,
        num_instance=ni,
    )
    return pk, vk


def _matrix_evals(cs: ConstraintSystem, M: int):
    """Extended-domain evaluations of <A_j,z>, <B_j,z>, <C_j,z> (host ints)."""
    p = cs.p
    nc, ni = cs.num_constraints, cs.num_instance
    a = [0] * M
    b = [0] * M
    c = [0] * M
    for j in range(nc):
        a[j] = cs.lc_value(cs.A[j])
        b[j] = cs.lc_value(cs.B[j])
        c[j] = cs.lc_value(cs.C[j])
    for i in range(ni):  # input-consistency rows
        a[nc + i] = cs.values[i]
    return a, b, c


def _matrix_evals_native(cs: ConstraintSystem, M: int, nf):
    """Native-path matrix evaluation: CSR mont matvec -> (M, n16) mont planes.

    Returns (da, db, dc) Montgomery 16-bit limb planes ready for the device
    NTT pipeline, plus the z witness as canonical u64 rows (reused by the
    proof MSM scalar classification).  The CSR structure + Montgomery
    coefficients are circuit constants, cached on the cs instance.
    """
    from zkmember_tpu import native as zknative

    nc, ni = cs.num_constraints, cs.num_instance
    cache = getattr(cs, "_native_csr", None)
    if cache is None:
        (ia, ca, va), (ib, cb, vb), (ic, cc, vc) = cs.to_sparse()
        cache = cs._native_csr = [
            (ind, col, nf.to_mont(zknative.ints_to_u64(vals, nf.nl)))
            for ind, col, vals in ((ia, ca, va), (ib, cb, vb), (ic, cc, vc))
        ]
    z_rows = zknative.ints_to_u64(cs.values, nf.nl)
    z_mont = nf.to_mont(z_rows)

    def eval_one(entry, instance_rows: bool):
        ind, col, coeffs = entry
        ev = nf.csr_matvec(ind, col, coeffs, z_mont)  # (nc, nl) mont
        full = np.zeros((M, nf.nl), "<u8")
        full[:nc] = ev
        if instance_rows:
            full[nc : nc + ni] = z_mont[:ni]
        return jnp.asarray(zknative.u64_to_u16_planes(full))

    da = eval_one(cache[0], True)
    db = eval_one(cache[1], False)
    dc = eval_one(cache[2], False)
    return da, db, dc, z_rows


@partial(jax.jit, static_argnums=(0,))
def _h_kernel(domain: "nttmod.Domain", a, b, c, zh_inv):
    """Coset-evaluation H pipeline: coeffs of (AB - C)/Z_H (device)."""
    spec = domain.spec
    ca = nttmod.intt(domain, a)
    cb = nttmod.intt(domain, b)
    cc = nttmod.intt(domain, c)
    ea = nttmod.coset_ntt(domain, ca)
    eb = nttmod.coset_ntt(domain, cb)
    ec = nttmod.coset_ntt(domain, cc)
    hh = dv.sub(spec, dv.mont_mul(spec, ea, eb), ec)
    hh = dv.mont_mul(spec, hh, jnp.broadcast_to(zh_inv, hh.shape))
    return nttmod.coset_intt(domain, hh)


def prove(pk: ProvingKey, cs: ConstraintSystem, rng=None) -> Proof:
    """Groth16 prover: witness -> H(x) via coset NTTs -> classified MSMs.

    ZKMEMBER_TRACE=1 emits per-phase wall times to stderr (obs.Profiler —
    this framework's counterpart of the reference's Criterion phase view).
    """
    import os
    import sys

    from zkmember_tpu.utils import obs

    prof = obs.Profiler(
        emit=(lambda s: print(f"# {s}", file=sys.stderr, flush=True))
        if os.environ.get("ZKMEMBER_TRACE")
        else None
    )
    cfg = pairing_config(pk.curve)
    rng = rng or frng.test_rng()
    r_mod = cfg.r
    mod = cfg.mod
    g1, g2 = mod.G1, mod.G2
    z = cs.values

    rr = frng.field_element(rng, r_mod)
    ss = frng.field_element(rng, r_mod)

    # H coefficients
    from zkmember_tpu import native as zknative

    M = pk.domain_size
    domain = nttmod.Domain.get(cfg.fr_spec, M)
    spec = cfg.fr_spec
    nf = zknative.NativeField.get(spec.p, spec.n)
    with prof.phase("matrix_evals"):
        if nf is not None:
            da, db, dc, z_rows = _matrix_evals_native(cs, M, nf)
        else:  # pure-Python fallback (no host toolchain)
            a_ev, b_ev, c_ev = _matrix_evals(cs, M)
            da = jnp.asarray(spec.to_mont_host(a_ev))
            db = jnp.asarray(spec.to_mont_host(b_ev))
            dc = jnp.asarray(spec.to_mont_host(c_ev))
            z_rows = None
    zh_inv = jnp.asarray(spec.mont_scalar(pow(domain.vanishing_on_coset(), -1, spec.p)))
    with prof.phase("h_kernel"):
        h_planes = np.asarray(_h_kernel(domain, da, db, dc, zh_inv))
    with prof.phase("h_to_host"):
        if nf is not None:
            h = nf.from_mont(zknative.u16_planes_to_u64(h_planes))[: M - 1]
            za = z_rows[pk.a_nonzero]
            zb = z_rows[pk.b_nonzero]
            zl = z_rows[[pk.num_instance + i for i in pk.l_nonzero]]
        else:
            h = spec.from_mont_host(h_planes)[: M - 1]
            za = [z[i] for i in pk.a_nonzero]
            zb = [z[i] for i in pk.b_nonzero]
            zl = [z[pk.num_instance + i] for i in pk.l_nonzero]

    # MSMs (device, scalar-classified)
    with prof.phase("msm_a"):
        a_acc = msmmod.msm(pk.a_query, za, r_mod)
    with prof.phase("msm_b1"):
        b1_acc = msmmod.msm(pk.b_g1_query, zb, r_mod)
    with prof.phase("msm_b2"):
        b2_acc = msmmod.msm(pk.b_g2_query, zb, r_mod)
    with prof.phase("msm_h"):
        h_acc = msmmod.msm(pk.h_query, h, r_mod)
    with prof.phase("msm_l"):
        l_acc = msmmod.msm(pk.l_query, zl, r_mod)

    # assemble (host single-point arithmetic)
    A = g1.add(g1.add(pk.vk.alpha_g1, a_acc), g1.mul(rr, pk.delta_g1))
    B2 = g2.add(g2.add(pk.vk.beta_g2, b2_acc), g2.mul(ss, pk.vk.delta_g2))
    B1 = g1.add(g1.add(pk.beta_g1, b1_acc), g1.mul(ss, pk.delta_g1))
    C = l_acc
    C = g1.add(C, h_acc)
    C = g1.add(C, g1.mul(ss, A))
    C = g1.add(C, g1.mul(rr, B1))
    C = g1.add(C, g1.mul((-rr * ss) % r_mod, pk.delta_g1))
    if prof._emit is not None:
        prof.dump()
    return Proof(curve=pk.curve, a=A, b=B2, c=C)


def verify(vk: VerifyingKey, public_inputs: list[int], proof: Proof) -> bool:
    """3-pairing product check on host: e(A,B) = e(alpha,beta) e(IC,gamma) e(C,delta).

    Public inputs exclude the leading ONE (as in ark: verify(&vk, &[root,
    leaf], &proof), pedersen381/mod.rs:70-71).
    """
    cfg = pairing_config(vk.curve)
    mod = cfg.mod
    g1 = mod.G1
    assert len(public_inputs) + 1 == len(vk.gamma_abc_g1)
    ic = vk.gamma_abc_g1[0]
    for x, pt in zip(public_inputs, vk.gamma_abc_g1[1:]):
        ic = g1.add(ic, g1.mul(int(x) % cfg.r, pt))
    # e(A,B) * e(-alpha,beta) * e(-IC,gamma) * e(-C,delta) == 1
    one = mod.multi_pairing(
        [
            (proof.a, proof.b),
            (g1.neg(vk.alpha_g1), vk.beta_g2),
            (g1.neg(ic), vk.gamma_g2),
            (g1.neg(proof.c), vk.delta_g2),
        ]
    )
    return one == type(one).one()
