"""NTT/iNTT/coset transforms vs a host-side naive DFT oracle."""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv
from zkmember_tpu import ntt as nttmod


SPECS = [dv.BLS_FR, dv.BW6_FR]
IDS = [s.name for s in SPECS]


def naive_dft(vals, w, p):
    n = len(vals)
    return [sum(vals[j] * pow(w, i * j, p) for j in range(n)) % p for i in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_ntt_roundtrip_and_oracle(spec):
    r = random.Random(5)
    N = 16
    dom = nttmod.Domain(spec, N)
    coeffs = [r.randrange(spec.p) for _ in range(N)]
    dc = jnp.asarray(spec.to_mont_host(coeffs))

    evals = jax.jit(lambda x: nttmod.ntt(dom, x))(dc)
    got = spec.from_mont_host(np.asarray(evals))
    assert got == naive_dft(coeffs, dom.w, spec.p)

    back = jax.jit(lambda x: nttmod.intt(dom, x))(evals)
    assert spec.from_mont_host(np.asarray(back)) == coeffs


def test_coset_and_vanishing():
    spec = dv.BLS_FR
    p = spec.p
    r = random.Random(6)
    N = 8
    dom = nttmod.Domain(spec, N)
    coeffs = [r.randrange(p) for _ in range(N)]
    dc = jnp.asarray(spec.to_mont_host(coeffs))

    ev = jax.jit(lambda x: nttmod.coset_ntt(dom, x))(dc)
    got = spec.from_mont_host(np.asarray(ev))
    g = dom.coset_gen
    want = [
        sum(coeffs[j] * pow(g * pow(dom.w, i, p) % p, j, p) for j in range(N)) % p
        for i in range(N)
    ]
    assert got == want

    back = jax.jit(lambda x: nttmod.coset_intt(dom, x))(ev)
    assert spec.from_mont_host(np.asarray(back)) == coeffs

    # Z_H is constant on the coset
    zh = dom.vanishing_on_coset()
    for i in range(N):
        x = g * pow(dom.w, i, p) % p
        assert (pow(x, N, p) - 1) % p == zh


def test_batched_ntt():
    spec = dv.BLS_FR
    N = 8
    dom = nttmod.Domain(spec, N)
    r = random.Random(7)
    rows = [[r.randrange(spec.p) for _ in range(N)] for _ in range(3)]
    dc = jnp.asarray(
        np.stack([spec.to_mont_host(row) for row in rows])
    )  # (3, N, n)
    ev = jax.jit(lambda x: nttmod.ntt(dom, x))(dc)
    for i, row in enumerate(rows):
        got = spec.from_mont_host(np.asarray(ev[i]))
        assert got == naive_dft(row, dom.w, spec.p)
