"""Multi-chip SPMD layer: device meshes + sharded MSM / hashing / NTT.

The reference's only parallelism is rayon shared-memory data parallelism
inside arkworks (SURVEY.md section 2.3); the TPU-native equivalent is SPMD
over a jax.sharding.Mesh with XLA collectives over ICI:

  * axis "dp"  — independent work items (leaf batches, proof batches);
  * axis "msm" — points *within* one MSM: each device reduces its shard,
    the per-device Jacobian partials are all_gather'ed (one small collective)
    and every device finishes the log2(n_dev) tail locally.

Field-element partial sums additionally exploit the limb representation:
sums of < 2^9 Montgomery limb planes fit u32 columns, so a cross-device
field reduction is a plain `psum` of raw columns followed by one local
carry+mod — integer collectives over ICI, no group law involved (used by
the sharded witness inner products).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.experimental.shard_map import shard_map

from zkmember_tpu.fields import device as dv
from zkmember_tpu.curves import device as cdv


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """2D (dp, msm) mesh over the available devices."""
    devs = np.array(jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    dp = dp or 1
    assert n % dp == 0
    return Mesh(devs.reshape(dp, n // dp), ("dp", "msm"))


# ---------------------------------------------------------------------------
# sharded MSM: points split over the "msm" axis
# ---------------------------------------------------------------------------


def sharded_msm(F, mesh: Mesh, bits, X, Y):
    """MSM with points sharded across mesh axis "msm".

    bits: (B, nbits) scalar bits; X/Y affine coord planes (B, n).  B must be
    divisible by the msm axis size.  Each device computes its shard's
    partial Jacobian sum, partials ride ONE all_gather over ICI, and the
    log2(n_dev) combine tail is replicated.  Returns a replicated Jacobian
    point (batch shape (1,)).
    """

    def local(bits, X, Y):
        P_loc = (X, Y, F.ones((X.shape[0] if not isinstance(X, tuple) else X[0].shape[0],)))
        part = cdv.sw_msm(F, bits, P_loc)  # local partial, batch shape ()
        part = tuple(_lift(c) for c in part)  # (1, ...) for gathering
        gathered = tuple(
            jax.tree.map(lambda c: jax.lax.all_gather(c, "msm", axis=0, tiled=True), c)
            for c in part
        )
        total = cdv.sw_tree_reduce(F, gathered)
        return tuple(_lift(c) for c in total)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("msm", None), _coord_spec(X), _coord_spec(Y)),
        out_specs=_point_spec(X),
        check_rep=False,
    )
    return fn(bits, X, Y)


def _lift(c):
    if isinstance(c, tuple):
        return tuple(_lift(ci) for ci in c)
    return c[None]


def _coord_spec(c):
    if isinstance(c, tuple):
        return tuple(_coord_spec(ci) for ci in c)
    return P("msm", None)


def _point_spec(X):
    one = _coord_spec_rep(X)
    return (one, one, one)


def _coord_spec_rep(c):
    if isinstance(c, tuple):
        return tuple(_coord_spec_rep(ci) for ci in c)
    return P(None, None)


# ---------------------------------------------------------------------------
# sharded field reduction: psum of u32 limb columns + one local reduction
# ---------------------------------------------------------------------------


def sharded_field_sum(spec: dv.FieldSpec, mesh: Mesh, vals, max_log_terms: int = 9):
    """sum_i vals[i] mod p with vals (B, n) sharded over "msm".

    Local column sums stay < B_local * 2^16 (caller keeps B_local < 2^15);
    the cross-device step is an integer psum over ICI.  The carried total is
    < B * p with B <= 2^max_log_terms, so the final mod is a ladder of
    conditional subtractions of p << j (single `_cond_sub_p` only handles
    values < 2p).
    """

    def local(v):
        cols = jnp.sum(v, axis=0, keepdims=True)  # (1, n) u32 columns
        cols = jax.lax.psum(cols, "msm")
        wide = dv._carry(cols, spec.n + 2)  # value < 2^max_log_terms * p
        nw = spec.n + 2
        for j in range(max_log_terms, -1, -1):
            pj = dv.int_to_limbs(spec.p << j, nw)
            diff, borrow = dv._sub_limbs(wide, jnp.broadcast_to(jnp.asarray(pj), wide.shape), nw)
            wide = jnp.where((borrow == 0)[..., None], diff, wide)
        return wide[..., : spec.n]

    fn = shard_map(
        local, mesh=mesh, in_specs=P("msm", None), out_specs=P(None, None), check_rep=False
    )
    return fn(vals)


# ---------------------------------------------------------------------------
# multi-chip NTT: four-step decomposition, ONE all_to_all over the mesh
# ---------------------------------------------------------------------------


_TW_CACHE: dict = {}


def _fourstep_twiddles(spec, N1: int, N2: int) -> np.ndarray:
    """(N1, N2) Montgomery table of w^(j1*k2), w = canonical root of order
    N1*N2 (incremental products; cached per (field, N1, N2))."""
    key = (spec.p, N1, N2)
    if key not in _TW_CACHE:
        from zkmember_tpu import ntt as nttmod

        p = spec.p
        w = nttmod.Domain.get(spec, N1 * N2).w
        rows = []
        wj = 1
        for _ in range(N1):
            row = [1] * N2
            for k in range(1, N2):
                row[k] = row[k - 1] * wj % p
            rows.append(spec.to_mont_host(row))
            wj = wj * w % p
        _TW_CACHE[key] = np.stack(rows)  # (N1, N2, n)
    return _TW_CACHE[key]


def sharded_ntt(spec, mesh: Mesh, values, axis: str = "msm"):
    """NTT of size N = len(values) with the butterfly axis sharded over
    `axis` — the TPU-native equivalent of ark-poly's parallel FFT at
    domains exceeding one chip (SURVEY.md sections 2.3 / 7.1 item 3).

    Four-step algorithm: reshape to (N1, N2) with N1 = rows sharded across
    devices; (1) local row NTTs of length N2, (2) local twiddle scaling by
    w^(j1 k2), (3) ONE all_to_all redistributing columns, (4) local column
    NTTs of length N1.  Communication is a single balanced all-to-all over
    ICI instead of per-stage exchanges.

    values: (N, n_limbs) Montgomery coefficients, natural order, replicated.
    Returns the (N, n_limbs) evaluations, natural order, replicated (the
    production path would keep the output sharded; the final all_gather
    exists so single-host callers get a plain array).
    """
    from zkmember_tpu import ntt as nttmod

    D = mesh.shape[axis]
    N = values.shape[0]
    assert N & (N - 1) == 0 and N % (D * D) == 0, (
        "N must be a power of two with D | N1 and D | N2"
    )
    N1 = max(D, 1 << (N.bit_length() // 2))  # ~sqrt(N), multiple of D
    N2 = N // N1
    dom1 = nttmod.Domain.get(spec, N1)
    dom2 = nttmod.Domain.get(spec, N2)
    tw = jnp.asarray(_fourstep_twiddles(spec, N1, N2))

    # x_mat[j1, j2] = x[j1 + N1*j2]
    x_mat = jnp.moveaxis(values.reshape(N2, N1, spec.n), 0, 1)

    def local(xm, twm):
        # xm: (N1/D, N2, n) — row NTTs along axis 0 of each row's N2 axis
        a = nttmod._fft_core_axis(dom2, xm, axis=1, inverse=False)
        b = dv.mont_mul(spec, a, twm)
        # redistribute: split the k2 axis into D chunks, all_to_all so each
        # device ends with full-j1 columns for its k2 slice
        b = b.reshape(N1 // D, D, N2 // D, spec.n)
        b = jax.lax.all_to_all(b, axis, split_axis=1, concat_axis=0, tiled=False)
        # now (D, N1/D, N2/D, n) -> (N1, N2/D, n)
        b = b.reshape(N1, N2 // D, spec.n)
        c = nttmod._fft_core_axis(dom1, b, axis=0, inverse=False)
        # gather k2 slices back so every device holds the full (N1, N2)
        full = jax.lax.all_gather(c, axis, axis=0, tiled=False)
        # (D, N1, N2/D, n) -> (N1, N2, n): k2 = dev*(N2/D) + local
        full = jnp.moveaxis(full, 0, 1).reshape(N1, N2, spec.n)
        return full

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None)),
        out_specs=P(None, None, None),
        check_rep=False,
    )
    C = fn(x_mat, tw)  # C[k1, k2] = X[k2 + N2*k1]
    return C.reshape(N, spec.n)


# ---------------------------------------------------------------------------
# data-parallel hashing: leaves split over the full mesh
# ---------------------------------------------------------------------------


def sharded_two_to_one(params, mesh: Mesh, left, right):
    """Batched two-to-one Pedersen hash with the leaf batch sharded over dp."""
    from zkmember_tpu.hash import pedersen as ph

    def local(l, r):
        return ph.two_to_one_device(params, l, r)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(("dp", "msm"), None), P(("dp", "msm"), None)),
        out_specs=P(("dp", "msm"), None),
        check_rep=False,
    )
    return fn(left, right)
