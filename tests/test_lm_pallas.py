"""Oracle tests for the limb-major Pallas Montgomery kernel.

Runs in interpret mode on the CPU test mesh (the kernel compiles natively
only on TPU); bit-exact against the XLA limb-major path, which is itself
oracle-tested against host bignums in test_lm.py.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from zkmember_tpu.fields import device as dv
from zkmember_tpu.fields import lm, lm_pallas


@pytest.mark.parametrize("spec", [dv.BLS_FQ, dv.BLS_FR, dv.BW6_FQ])
def test_pallas_lm_matches_xla(spec):
    rng = random.Random(9)
    B = lm_pallas._tile_b(spec.n)
    avals = [rng.randrange(spec.p) for _ in range(B)]
    bvals = [rng.randrange(spec.p) for _ in range(B)]
    a = lm.to_lm(spec.to_mont_host(avals))
    b = lm.to_lm(spec.to_mont_host(bvals))
    want = np.asarray(lm.mont_mul_xla(spec, a, b))
    got = np.asarray(lm_pallas.mont_mul(spec, a, b))
    assert np.array_equal(got, want)


def test_pallas_lm_leading_dims_and_broadcast():
    spec = dv.BLS_FQ
    rng = random.Random(10)
    B = lm_pallas._tile_b(spec.n)
    a = jnp.stack(
        [lm.to_lm(spec.to_mont_host([rng.randrange(spec.p) for _ in range(B)]))
         for _ in range(3)]
    )  # (3, n, B)
    b1 = lm.to_lm(spec.to_mont_host([rng.randrange(spec.p)]))  # (n, 1)
    b = jnp.broadcast_to(b1, a.shape)
    want = np.asarray(lm.mont_mul_xla(spec, a, b))
    got = np.asarray(lm_pallas.mont_mul(spec, a, b))
    assert np.array_equal(got, want)


def test_fits_gating():
    spec = dv.BLS_FQ
    tb = lm_pallas._tile_b(spec.n)
    assert lm_pallas.fits((4, spec.n, 8 * tb), spec.n)
    assert not lm_pallas.fits((spec.n, 100), spec.n)  # non-multiple lanes
    assert not lm_pallas.fits((spec.n, 1), spec.n)  # scalar column
