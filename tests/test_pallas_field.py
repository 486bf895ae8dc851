"""Pallas Montgomery kernel vs the XLA limb path (interpret mode on CPU).

The fused kernel (fields.pallas_field) must agree bit-for-bit with
fields.device.mont_mul for every shipped field; on the CPU test platform it
runs through the pallas interpreter, on TPU (opt-in ZKMEMBER_PALLAS=1) the
same code compiles via Mosaic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkmember_tpu.fields import device as dv
from zkmember_tpu.fields import pallas_field as pf


@pytest.mark.parametrize("spec", [dv.BLS_FR, dv.BLS_FQ, dv.BW6_FQ],
                         ids=lambda s: s.name)
def test_pallas_matches_xla(spec):
    n = spec.n
    rng = np.random.RandomState(7)
    a_ints = [int(rng.randint(0, 2**62)) * 3_000_000_007 % spec.p for _ in range(5)]
    b_ints = [(v * 31 + 7) % spec.p for v in a_ints]
    # include edge rows: 0, 1, p-1
    a_ints += [0, 1, spec.p - 1]
    b_ints += [spec.p - 1, spec.p - 1, spec.p - 1]
    A = jnp.asarray(dv.ints_to_limbs(a_ints, n))
    B = jnp.asarray(dv.ints_to_limbs(b_ints, n))
    ref = np.asarray(dv.mont_mul(spec, A, B))
    out = np.asarray(pf.mont_mul(spec, A, B))
    assert (ref == out).all()


def test_pallas_broadcast_and_shapes():
    spec = dv.BLS_FR
    rng = np.random.RandomState(9)
    a = jnp.asarray(dv.ints_to_limbs([int(rng.randint(1, 2**60)) for _ in range(6)], spec.n))
    b = jnp.asarray(spec.mont_scalar(12345))  # (n,) broadcasts over rows
    ref = np.asarray(dv.mont_mul(spec, a, jnp.broadcast_to(b, a.shape)))
    out = np.asarray(pf.mont_mul(spec, a, b))
    assert (ref == out).all()
    # leading batch dims flatten and restore
    a3 = a.reshape(2, 3, spec.n)
    out3 = np.asarray(pf.mont_mul(spec, a3, b))
    assert out3.shape == (2, 3, spec.n)
    assert (out3.reshape(6, spec.n) == out).all()
