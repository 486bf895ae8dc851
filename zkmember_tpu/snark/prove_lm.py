"""Groth16 prover v2: limb-major kernels, static scalar classes, few dispatches.

Drives the round-4 compute stack (fields.lm / msm.straus / ntt.lm) against
the same ProvingKey the v1 setup produces.  Pipeline per proof (reference
call stack: /root/reference — ark-groth16 prove, SURVEY.md section 3.1):

  host   witness synthesis -> native CSR matvecs (A z, B z, C z)
  device H = coset-NTT pipeline, ONE program, output stays resident
  device 5 proof MSMs: Straus windows for general-class scalars,
         masked tree reduction for the boolean class (static per circuit)
  host   randomized assembly (A, B, C from r, s) + serialization

Static classification: every query's point set is partitioned ONCE (at key
build) into boolean-class lanes (witness vars carrying gadget Booleans —
the majority in Pedersen circuits) and general lanes; each class gets a
padded power-of-two plane set, so proofs never gather on device.
"""

from __future__ import annotations

from dataclasses import dataclass

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
    """(..., b) -> (..., B) zero-padded along the last axis."""
    b = arr.shape[-1]
    if b == B:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, B - b)]
    return np.pad(arr, pad)


@dataclass
class _QueryLM:
    """One MSM query's device-resident planes, split by scalar class."""

    gen_X: object  # limb-major coord planes (or Fp2 tuples), padded
    gen_Y: object
    gen_z_cols: np.ndarray  # var indices feeding the general lanes
    gen_B: int
    bool_X: object
    bool_Y: object
    bool_z_cols: np.ndarray
    bool_B: int


class Groth16KeysLM:
    """Limb-major proving-key planes + static scalar classes for prove_lm.

    Built from the v1 ProvingKey (device or checkpoint-loaded) plus the
    circuit's boolean-variable set."""

    def __init__(self, pk: "groth16.ProvingKey", cs: ConstraintSystem):
        self.pk = pk
        cfg = groth16.pairing_config(pk.curve)
        self.cfg = cfg
        self.ops1 = _sw_ops_lm(cfg, g2=False)
        self.ops2 = _sw_ops_lm(cfg, g2=True)
        self.fr = cfg.fr_spec
        self.nwin = (cfg.r.bit_length() + straus.WINDOW_BITS - 1) // straus.WINDOW_BITS
        self.domain_lm = nttlm.DomainLM.get(self.fr, pk.domain_size)

        boolean = cs.boolean_vars
        ni = pk.num_instance

        def split(idx_list, is_bool_fn):
            idx = np.asarray(idx_list, np.int64)
            mask = np.fromiter((is_bool_fn(i) for i in idx), bool, len(idx))
            return idx[~mask], idx[mask]

        a_gen, a_bool = split(pk.a_nonzero, lambda i: i in boolean)
        b_gen, b_bool = split(pk.b_nonzero, lambda i: i in boolean)
        l_gen, l_bool = split(pk.l_nonzero, lambda i: (i + ni) in boolean)

        def planes(pa, take, g2=False):
            """PointArray rows -> limb-major numpy planes (host-side)."""

            def conv(c):
                if isinstance(c, tuple):
                    return tuple(conv(ci) for ci in c)
                return np.swapaxes(np.asarray(c)[take], -1, -2)

            return conv(pa.x), conv(pa.y)

        def pad_planes(xy, B):
            def pd(c):
                if isinstance(c, tuple):
                    return tuple(pd(ci) for ci in c)
                return jnp.asarray(_pad_lanes(c, B))

            return pd(xy[0]), pd(xy[1])

        def build_query(pa, nz, gen_idx, bool_idx, g2=False):
            pos = {v: k for k, v in enumerate(nz)}
            gen_take = np.asarray([pos[i] for i in gen_idx], np.int64)
            bool_take = np.asarray([pos[i] for i in bool_idx], np.int64)
            gB = max(1, _next_pow2(len(gen_take)))
            bB = max(1, _next_pow2(len(bool_take)))
            gx, gy = pad_planes(planes(pa, gen_take, g2), gB)
            bx, by = pad_planes(planes(pa, bool_take, g2), bB)
            return _QueryLM(gx, gy, np.asarray(gen_idx), gB, bx, by, np.asarray(bool_idx), bB)

        self.a_q = build_query(pk.a_query, pk.a_nonzero, a_gen, a_bool)
        self.b_q1 = build_query(pk.b_g1_query, pk.b_nonzero, b_gen, b_bool)
        self.b_q2 = build_query(
            pk.b_g2_query, pk.b_nonzero, b_gen, b_bool, g2=pk.curve == "bls12_381"
        )
        l_nz = pk.l_nonzero
        self.l_q = build_query(
            pk.l_query, l_nz, [i for i in l_nz if (i + ni) not in boolean],
            [i for i in l_nz if (i + ni) in boolean],
        )
        # l query's z columns are witness-relative: shift to absolute
        self.l_q.gen_z_cols = self.l_q.gen_z_cols + ni
        self.l_q.bool_z_cols = self.l_q.bool_z_cols + ni

        # H query: all-general, domain-size lanes (scalar M-1 padded w/ 0)
        M = pk.domain_size
        hx, hy = planes(pk.h_query, np.arange(M - 1), False)
        self.h_X, self.h_Y = pad_planes((hx, hy), M)


def _z_rows16(cs: ConstraintSystem, fr: dv.FieldSpec) -> np.ndarray:
    """Witness vector as (n_limbs16, n_vars) canonical u32 planes."""
    from zkmember_tpu import native as zknative

    nl64 = (fr.n + 3) // 4
    rows = zknative.ints_to_u64(cs.values, nl64)  # (V, nl64) LE u64
    u16 = rows.view("<u2").astype(np.uint32)[:, : fr.n]  # (V, n)
    return np.ascontiguousarray(u16.T)


def _msm_pair(keys: Groth16KeysLM, q: _QueryLM, z16: np.ndarray, ops, curve):
    """Run (general + boolean) MSMs for one query; host affine result."""
    parts = []
    if len(q.gen_z_cols):
        zq = jnp.asarray(_pad_lanes(z16[:, q.gen_z_cols], q.gen_B))
        out = straus.msm_program(ops, q.gen_X, q.gen_Y, zq, keys.nwin)
        parts.append(out)
    if len(q.bool_z_cols):
        mask = jnp.asarray(
            _pad_lanes(z16[0:1, q.bool_z_cols][0].astype(np.uint32), q.bool_B)
        )
        out = straus.bool_msm_program(ops, q.bool_X, q.bool_Y, mask)
        parts.append(out)
    host = [straus.projective_to_host(None, curve, p) for p in parts]
    acc = None
    for h in host:
        if h is None:
            continue
        acc = h if acc is None else curve.add(acc, h)
    return acc


def prove(keys: Groth16KeysLM, cs: ConstraintSystem, rng=None) -> "groth16.Proof":
    """Groth16 prove on the limb-major stack (drop-in for groth16.prove)."""
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
    rng = rng or frng.test_rng()
    rr = frng.field_element(rng, r_mod)
    ss = frng.field_element(rng, r_mod)
    fr = keys.fr
    M = pk.domain_size
    nf = zknative.NativeField.get(fr.p, fr.n)

    with prof.phase("matrix_evals"):
        if nf is not None:
            da, db, dc, _ = groth16._matrix_evals_native(cs, M, nf)
            # batch-major planes -> limb-major
            da, db, dc = (lm.to_lm(x) for x in (da, db, dc))
        else:
            a_ev, b_ev, c_ev = groth16._matrix_evals(cs, M)
            da = lm.to_lm(fr.to_mont_host(a_ev))
            db = lm.to_lm(fr.to_mont_host(b_ev))
            dc = lm.to_lm(fr.to_mont_host(c_ev))

    with prof.phase("h_pipeline"):
        h_limbs = nttlm.groth16_h(keys.domain_lm, da, db, dc)  # (n, M) canonical

    with prof.phase("witness_planes"):
        z16 = _z_rows16(cs, fr)

    with prof.phase("msm_a"):
        a_acc = _msm_pair(keys, keys.a_q, z16, keys.ops1, g1)
    with prof.phase("msm_b1"):
        b1_acc = _msm_pair(keys, keys.b_q1, z16, keys.ops1, g1)
    with prof.phase("msm_b2"):
        b2_acc = _msm_pair(keys, keys.b_q2, z16, keys.ops2, g2)
    with prof.phase("msm_h"):
        # H scalars: device-resident canonical limbs; last lane zero-padded
        h_out = straus.msm_program(keys.ops1, keys.h_X, keys.h_Y, h_limbs, keys.nwin)
        h_acc = straus.projective_to_host(None, g1, h_out)
    with prof.phase("msm_l"):
        l_acc = _msm_pair(keys, keys.l_q, z16, keys.ops1, g1)

    with prof.phase("assemble"):
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
    return groth16.Proof(curve=pk.curve, a=A, b=B2, c=C)
