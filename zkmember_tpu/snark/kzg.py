"""KZG10 polynomial commitments (Marlin flavor: degree bounds + batching).

Capability parity with `ark-poly-commit`'s MarlinKZG10 as the reference's
Marlin bench uses it (SURVEY.md section 2.2 row ark-poly-commit;
/root/reference/benches/marlin.rs:99-113).

Host/device split: commitments and opening proofs are MSMs over the SRS
powers (device, via zkmember_tpu.msm); the witness-polynomial synthetic
division and the pairing checks run on host (O(N) bignum / O(1) pairings).

Degree bounds use the shifted-powers technique: a commitment to p with
enforced bound d also carries a commitment to x^(D-d) p(x) under the top
SRS powers; the verifier checks consistency with one extra pairing term —
exactly the Marlin KZG construction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import zkmember_tpu.msm.msm as msmmod
from zkmember_tpu.snark.groth16 import (
    pairing_config,
    _fixed_base_mul,
    _fixed_base_mul_device,
)
from zkmember_tpu.utils import rng as frng


@dataclass
class UniversalParams:
    curve: str
    max_degree: int
    powers: "msmmod.PointArray"  # beta^i G1, i in [0, D]  (device)
    powers_host: list  # host mirrors (for small commits / debugging)
    h: tuple  # G2
    beta_h: tuple  # beta G2
    g: tuple  # G1 generator
    powers_lm: tuple | None = None  # lazily-built limb-major (X, Y) planes
    powers_tab: tuple | None = None  # lazily-built Straus tables (TPU path)


@dataclass
class Commitment:
    c: tuple  # G1 affine host point
    shifted: tuple | None = None  # commitment to x^(D-d) p(x), if bounded
    degree_bound: int | None = None


@dataclass
class OpeningProof:
    w: tuple  # G1 affine witness commitment


def setup(max_degree: int, curve: str = "bls12_381", rng=None) -> UniversalParams:
    """Universal SRS: powers of a fresh beta in G1 + (h, beta h) in G2."""
    cfg = pairing_config(curve)
    rng = rng or frng.test_rng()
    r = cfg.r
    mod = cfg.mod
    beta = frng.nonzero_field_element(rng, r)
    pows = [1] * (max_degree + 1)
    for i in range(1, max_degree + 1):
        pows[i] = pows[i - 1] * beta % r
    x, y, inf = _fixed_base_mul_device(cfg, cfg.F1, mod.G1_GEN, mod.G1, pows)
    assert not inf.any()
    return UniversalParams(
        curve=curve,
        max_degree=max_degree,
        powers=msmmod.PointArray(cfg.F1, mod.G1, x, y),
        powers_host=None,  # device-resident; materialize on demand
        h=mod.G2_GEN,
        beta_h=mod.G2.mul(beta, mod.G2_GEN),
        g=mod.G1_GEN,
    )


_MSM_CHUNK = 1 << 18  # max lanes per compiled Straus program


def _powers_lm(pp: UniversalParams):
    """Device-resident limb-major SRS planes (built once per pp)."""
    if pp.powers_lm is None:
        import jax.numpy as jnp

        X = jnp.swapaxes(pp.powers.x, -1, -2)
        Y = jnp.swapaxes(pp.powers.y, -1, -2)
        pp.powers_lm = (X, Y)
    return pp.powers_lm


_TAB_CHUNK = None  # resolved once from env


def _tab_chunk() -> int:
    global _TAB_CHUNK
    if _TAB_CHUNK is None:
        import os

        _TAB_CHUNK = int(os.environ.get("ZKMEMBER_KZG_CHUNK", str(1 << 14)))
    return _TAB_CHUNK


def _powers_tab(pp: UniversalParams):
    """Straus small-multiple tables over the SRS powers (built once per pp
    on the TPU path).  The SRS is fixed, so per-commit table builds are
    pure waste; with tables resident every KZG commit/open is ONE fused
    Pallas select+reduce call per 2^14-lane chunk (msm.pallas_msm)."""
    if pp.powers_tab is None:
        import jax.numpy as jnp

        from zkmember_tpu.msm import straus
        from zkmember_tpu.snark.prove_lm import _sw_ops_lm

        cfg = pairing_config(pp.curve)
        ops = _sw_ops_lm(cfg, g2=False)
        X, Y = _powers_lm(pp)
        w = _tab_chunk()
        D1 = X.shape[-1]
        Dpad = ((D1 + w - 1) // w) * w
        if Dpad != D1:
            pad = [(0, 0), (0, Dpad - D1)]
            X, Y = jnp.pad(X, pad), jnp.pad(Y, pad)
        pp.powers_tab = straus.table_program(ops, X, Y)
    return pp.powers_tab


def _use_tab(pp: UniversalParams) -> bool:
    import jax

    from zkmember_tpu.msm import pallas_msm

    if jax.default_backend() != "tpu" or not pallas_msm.enabled():
        return False
    import os

    max_lanes = int(os.environ.get("ZKMEMBER_TAB_LANES", str(1 << 19)))
    return pp.max_degree + 1 <= max_lanes


def _msm_powers_tab(pp: UniversalParams, planes: np.ndarray, offset: int):
    """Chunked fused-kernel MSM over the precomputed SRS tables.

    planes: (n, n16) canonical 16-bit scalar planes.  Chunks align to the
    fixed _tab_chunk() lane grid so ONE compiled kernel serves every
    degree/offset (leading grid lanes get zero scalars -> identity)."""
    import jax.numpy as jnp

    from zkmember_tpu.msm import straus
    from zkmember_tpu.snark.prove_lm import _sw_ops_lm

    cfg = pairing_config(pp.curve)
    fr = cfg.fr_spec
    ops = _sw_ops_lm(cfg, g2=False)
    nwin = (cfg.r.bit_length() + straus.WINDOW_BITS - 1) // straus.WINDOW_BITS
    tab = _powers_tab(pp)
    w = _tab_chunk()
    curve = cfg.mod.G1
    n = planes.shape[0]
    acc = None
    s = 0
    while s < n:
        g = offset + s
        start = (g // w) * w
        lead = g - start
        take = min(n - s, w - lead)
        zc = np.zeros((fr.n, w), np.uint32)
        zc[:, lead : lead + take] = planes[s : s + take].T
        tab_slice = tuple(c[..., start : start + w] for c in tab)
        out = straus.msm_precomp_program(ops, tab_slice, nwin, jnp.asarray(zc))
        part = straus.projective_to_host(None, curve, out)
        acc = part if acc is None else curve.add(acc, part)
        s += take
    return acc


def _msm_powers(pp: UniversalParams, coeffs, offset: int = 0):
    """sum_i coeffs[i] * beta^(offset+i) G via the limb-major Straus MSM.

    coeffs: list[int] (canonical) OR (n, nl) u64 Montgomery rows (the
    native fast path used by Marlin's row pipeline).  Chunked to
    _MSM_CHUNK lanes so one compiled program serves arbitrary degrees."""
    import jax.numpy as jnp

    from zkmember_tpu import native as zknative
    from zkmember_tpu.fields import lm
    from zkmember_tpu.msm import straus
    from zkmember_tpu.snark.prove_lm import _sw_ops_lm

    cfg = pairing_config(pp.curve)
    r = cfg.r
    fr = cfg.fr_spec
    if isinstance(coeffs, np.ndarray):
        nf = zknative.NativeField.get(fr.p, fr.n)
        rows = nf.from_mont(coeffs)  # canonical u64 rows
    else:
        rows = zknative.ints_to_u64([int(c) % r for c in coeffs], (fr.n + 3) // 4)
    n = rows.shape[0]
    assert offset + n <= pp.max_degree + 1
    planes = zknative.u64_to_u16_planes(rows)[:, : fr.n]  # (n, n16)
    if _use_tab(pp):
        return _msm_powers_tab(pp, planes, offset)
    ops = _sw_ops_lm(cfg, g2=False)
    nwin = (r.bit_length() + straus.WINDOW_BITS - 1) // straus.WINDOW_BITS
    X, Y = _powers_lm(pp)
    curve = cfg.mod.G1
    acc = None
    s = 0
    while s < n:
        e = min(s + _MSM_CHUNK, n)
        width = 1 << max(0, (e - s - 1).bit_length())
        Xc = X[..., offset + s : offset + e]
        Yc = Y[..., offset + s : offset + e]
        if e - s < width:
            pad = [(0, 0), (0, width - (e - s))]
            Xc = jnp.pad(Xc, pad)
            Yc = jnp.pad(Yc, pad)
        zc = np.zeros((fr.n, width), np.uint32)
        zc[:, : e - s] = planes[s:e].T
        wg = 1
        while wg < 8 and width * wg < (1 << 17) and nwin % (wg * 2) == 0:
            wg *= 2
        out = straus.msm_program(ops, Xc, Yc, jnp.asarray(zc), nwin, wg)
        part = straus.projective_to_host(None, curve, out)
        acc = part if acc is None else curve.add(acc, part)
        s = e
    return acc


def commit(pp: UniversalParams, coeffs: list[int], degree_bound: int | None = None) -> Commitment:
    """Commit to p (coefficient list, low->high); optional degree bound."""
    c = _msm_powers(pp, coeffs)
    shifted = None
    if degree_bound is not None:
        assert len(coeffs) - 1 <= degree_bound
        shift = pp.max_degree - degree_bound
        shifted = _msm_powers(pp, coeffs, offset=shift)
    return Commitment(c=c, shifted=shifted, degree_bound=degree_bound)


def poly_eval(coeffs: list[int], z: int, p: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % p
    return acc


def _synthetic_division(coeffs: list[int], z: int, p: int) -> list[int]:
    """q(x) = (p(x) - p(z)) / (x - z), degree deg(p) - 1 (host O(N))."""
    n = len(coeffs)
    q = [0] * (n - 1)
    acc = 0
    for i in range(n - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % p
        q[i - 1] = acc
    return q


def open_at(pp: UniversalParams, coeffs: list[int], z: int) -> tuple[int, OpeningProof]:
    """Evaluation v = p(z) and the KZG witness commitment W = [q(beta)]G."""
    cfg = pairing_config(pp.curve)
    r = cfg.r
    v = poly_eval(coeffs, z, r)
    q = _synthetic_division(coeffs, z, r)
    w = _msm_powers(pp, q) if q else None
    return v, OpeningProof(w=w)


def check(pp: UniversalParams, comm: Commitment, z: int, v: int, proof: OpeningProof) -> bool:
    """e(C - vG, H) == e(W, beta H - z H)  (host pairings)."""
    cfg = pairing_config(pp.curve)
    mod = cfg.mod
    g1, g2 = mod.G1, mod.G2
    lhs_pt = g1.add(comm.c, g1.neg(g1.mul(v % cfg.r, pp.g)))
    rhs_g2 = g2.add(pp.beta_h, g2.neg(g2.mul(z % cfg.r, pp.h)))
    w = proof.w
    if w is None:
        return lhs_pt is None
    # e(lhs, H) * e(-W, beta H - zH) == 1
    one = mod.multi_pairing([(lhs_pt, pp.h), (g1.neg(w), rhs_g2)])
    return one == type(one).one()


def check_degree_bound(
    pp: UniversalParams, comm: Commitment, z: int, v: int, v_shifted: int
) -> bool:
    """Degree-bound check at an opened point.

    With a two-term G2 SRS (H, beta*H) the bound cannot be checked from the
    commitment pair alone; the MarlinKZG10 protocol checks it through
    evaluations instead: if deg(p) <= d then the shifted polynomial is
    exactly X^(D-d) * p, so its opened value at z must equal v * z^(D-d).
    Callers must ALSO verify both openings (check / batch_check_same_point)
    at the same point — this is precisely what snark.marlin.verify does for
    g_1/g_2 (the "degree-bound consistency" step).
    """
    if comm.shifted is None or comm.degree_bound is None:
        return False
    cfg = pairing_config(pp.curve)
    r = cfg.r
    return v_shifted % r == v * pow(z % r, pp.max_degree - comm.degree_bound, r) % r


def batch_check_same_point(
    pp: UniversalParams, comms: list[Commitment], z: int, vals: list[int],
    proofs: list[OpeningProof], xi: int,
) -> bool:
    """Combine openings at one point with powers of challenge xi, 2 pairings."""
    cfg = pairing_config(pp.curve)
    mod = cfg.mod
    g1, g2 = mod.G1, mod.G2
    r = cfg.r
    acc_c, acc_w, acc_v, x = None, None, 0, 1
    for comm, v, prf in zip(comms, vals, proofs):
        acc_c = g1.add(acc_c, g1.mul(x, comm.c))
        if prf.w is not None:
            acc_w = g1.add(acc_w, g1.mul(x, prf.w))
        acc_v = (acc_v + x * v) % r
        x = x * xi % r
    lhs_pt = g1.add(acc_c, g1.neg(g1.mul(acc_v, pp.g)))
    rhs_g2 = g2.add(pp.beta_h, g2.neg(g2.mul(z % r, pp.h)))
    if acc_w is None:
        return lhs_pt is None
    one = mod.multi_pairing([(lhs_pt, pp.h), (g1.neg(acc_w), rhs_g2)])
    return one == type(one).one()
