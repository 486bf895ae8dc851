"""Multi-chip SPMD paths on the virtual 8-device CPU mesh (SURVEY.md sec 4)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkmember_tpu.fields import device as dv
from zkmember_tpu.curves import device as cdv
from zkmember_tpu.curves import bls12_381 as bls
import zkmember_tpu.msm.msm as msmmod
from zkmember_tpu.parallel import dist


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh from conftest"
)


def test_sharded_msm_matches_host():
    rng = random.Random(21)
    mesh = dist.make_mesh(8, dp=2)  # (2, 4): points sharded over 4 devices
    k = 8
    pts = [bls.G1.mul(rng.randrange(1, bls.R), bls.G1_GEN) for _ in range(k)]
    scalars = [rng.randrange(bls.R) for _ in range(k)]
    pa = msmmod.g1_points_from_host(dv.BLS_FQ, bls.G1, pts)
    bits = jnp.asarray(msmmod.scalars_to_bits_np(scalars, 255))

    F = dv.FpOps(dv.BLS_FQ)
    J = dist.sharded_msm(F, mesh, bits, pa.x, pa.y)
    x, y, inf = jax.jit(lambda J: cdv.sw_to_affine(F, J))(J)
    want = None
    for s, p in zip(scalars, pts):
        want = bls.G1.add(want, bls.G1.mul(s, p))
    assert not bool(np.asarray(inf)[0])
    got_x = dv.BLS_FQ.from_mont_host(np.asarray(x))[0]
    got_y = dv.BLS_FQ.from_mont_host(np.asarray(y))[0]
    assert (got_x, got_y) == (want[0].v, want[1].v)


def test_sharded_field_sum():
    rng = random.Random(22)
    spec = dv.BLS_FR
    mesh = dist.make_mesh(8, dp=2)
    vals = [rng.randrange(spec.p) for _ in range(16)]
    dvals = jnp.asarray(spec.to_mont_host(vals))
    out = dist.sharded_field_sum(spec, mesh, dvals)
    got = spec.from_mont_host(np.asarray(out))[0]
    assert got == sum(vals) * spec.R % spec.p * pow(spec.R, -1, spec.p) % spec.p


def test_sharded_ntt_matches_single_chip():
    """Four-step all_to_all NTT == single-chip Pease NTT (natural order)."""
    from zkmember_tpu import ntt as nttmod

    rng = random.Random(24)
    spec = dv.BLS_FR
    mesh = dist.make_mesh(8, dp=1)  # all 8 devices on the "msm" axis
    N = 256
    vals = [rng.randrange(spec.p) for _ in range(N)]
    x = jnp.asarray(spec.to_mont_host(vals))
    want = np.asarray(nttmod.ntt(nttmod.Domain.get(spec, N), x))
    got = np.asarray(dist.sharded_ntt(spec, mesh, x))
    assert (got == want).all()


def test_sharded_two_to_one():
    from zkmember_tpu.app import circuits as app
    from zkmember_tpu.hash import pedersen as ph
    from zkmember_tpu.utils import rng as frng

    cfg = app.get_config("pedersen381")
    _, node_params = cfg.setup_params(frng.test_rng())
    mesh = dist.make_mesh(8, dp=2)
    rng = random.Random(23)
    spec = node_params.spec
    ls = [rng.randrange(spec.p) for _ in range(8)]
    rs = [rng.randrange(spec.p) for _ in range(8)]
    dl = jnp.asarray(dv.ints_to_limbs(ls, spec.n))
    dr = jnp.asarray(dv.ints_to_limbs(rs, spec.n))
    got = dv.limbs_to_ints(np.asarray(dist.sharded_two_to_one(node_params, mesh, dl, dr)))
    want = [
        ph.two_to_one_host(node_params, l.to_bytes(32, "little"), r.to_bytes(32, "little")).v
        for l, r in zip(ls, rs)
    ]
    assert got == want
