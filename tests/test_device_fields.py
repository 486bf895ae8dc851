"""Device (JAX limb-plane) field arithmetic vs the host bignum oracle.

Mirrors the reference's reliance on ark-ff correctness (SURVEY.md section 2.2
row 1) — every device kernel is checked element-for-element against Python
bignum arithmetic across all four shipped fields.
"""

from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv


SPECS = [dv.BLS_FR, dv.BLS_FQ, dv.BW6_FR, dv.BW6_FQ]
IDS = [s.name for s in SPECS]

# jit everything once per spec — eager per-op dispatch is pathologically slow
mont_mul = partial(jax.jit, static_argnums=0)(dv.mont_mul)
f_add = partial(jax.jit, static_argnums=0)(dv.add)
f_sub = partial(jax.jit, static_argnums=0)(dv.sub)
f_neg = partial(jax.jit, static_argnums=0)(dv.neg)
f_inv = partial(jax.jit, static_argnums=0)(dv.inv)
f_to_mont = partial(jax.jit, static_argnums=0)(dv.to_mont)
f_from_mont = partial(jax.jit, static_argnums=0)(dv.from_mont)


def rand_ints(rng, spec, k):
    return [rng.randrange(spec.p) for _ in range(k)]


@pytest.fixture(scope="module")
def rng():
    import random

    return random.Random(12345)


def test_limb_roundtrip():
    import random

    r = random.Random(7)
    for spec in SPECS:
        vals = [0, 1, spec.p - 1] + [r.randrange(spec.p) for _ in range(5)]
        limbs = dv.ints_to_limbs(vals, spec.n)
        assert dv.limbs_to_ints(limbs) == vals


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_mont_roundtrip(spec, rng):
    vals = rand_ints(rng, spec, 8) + [0, 1, spec.p - 1]
    a = jnp.asarray(spec.to_mont_host(vals))
    back = spec.from_mont_host(np.asarray(a))
    assert back == vals
    # device to_mont/from_mont
    canon = jnp.asarray(dv.ints_to_limbs(vals, spec.n))
    m = f_to_mont(spec, canon)
    assert spec.from_mont_host(np.asarray(m)) == vals
    c2 = f_from_mont(spec, m)
    assert dv.limbs_to_ints(np.asarray(c2)) == vals


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_mul_add_sub(spec, rng):
    k = 16
    xs = rand_ints(rng, spec, k)
    ys = rand_ints(rng, spec, k)
    # include adversarial cases
    xs[0], ys[0] = spec.p - 1, spec.p - 1
    xs[1], ys[1] = 0, spec.p - 1
    xs[2], ys[2] = 1, 1
    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(ys))

    got = spec.from_mont_host(np.asarray(mont_mul(spec, a, b)))
    assert got == [x * y % spec.p for x, y in zip(xs, ys)]

    got = spec.from_mont_host(np.asarray(f_add(spec, a, b)))
    assert got == [(x + y) % spec.p for x, y in zip(xs, ys)]

    got = spec.from_mont_host(np.asarray(f_sub(spec, a, b)))
    assert got == [(x - y) % spec.p for x, y in zip(xs, ys)]

    got = spec.from_mont_host(np.asarray(f_neg(spec, a)))
    assert got == [(-x) % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=IDS)
def test_inv(spec, rng):
    xs = rand_ints(rng, spec, 4) + [1, spec.p - 1]
    a = jnp.asarray(spec.to_mont_host(xs))
    got = spec.from_mont_host(np.asarray(f_inv(spec, a)))
    assert got == [pow(x, -1, spec.p) for x in xs]


def test_batch_shapes():
    spec = dv.BLS_FR
    a = jnp.asarray(spec.to_mont_host([3, 5, 7, 11])).reshape(2, 2, spec.n)
    out = mont_mul(spec, a, a)
    assert out.shape == (2, 2, spec.n)
    flat = spec.from_mont_host(np.asarray(out).reshape(4, spec.n))
    assert flat == [9, 25, 49, 121]


def test_jit_and_vs_host_random_stress(rng):
    spec = dv.BLS_FQ
    k = 64
    xs = rand_ints(rng, spec, k)
    ys = rand_ints(rng, spec, k)

    @jax.jit
    def f(a, b):
        return dv.mont_mul(spec, f_add(spec, a, b), f_sub(spec, a, b))

    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(ys))
    got = spec.from_mont_host(np.asarray(f(a, b)))
    assert got == [(x + y) * (x - y) % spec.p for x, y in zip(xs, ys)]


def test_fp2_ops(rng):
    spec = dv.BLS_FQ2
    base = spec.base
    p = base.p
    k = 8
    a0, a1 = rand_ints(rng, base, k), rand_ints(rng, base, k)
    b0, b1 = rand_ints(rng, base, k), rand_ints(rng, base, k)
    A = (jnp.asarray(base.to_mont_host(a0)), jnp.asarray(base.to_mont_host(a1)))
    B = (jnp.asarray(base.to_mont_host(b0)), jnp.asarray(base.to_mont_host(b1)))

    C = jax.jit(lambda A, B: dv.fp2_mul(spec, A, B))(A, B)
    c0 = base.from_mont_host(np.asarray(C[0]))
    c1 = base.from_mont_host(np.asarray(C[1]))
    # (a0 + a1 u)(b0 + b1 u), u^2 = -1
    exp0 = [(x0 * y0 - x1 * y1) % p for x0, x1, y0, y1 in zip(a0, a1, b0, b1)]
    exp1 = [(x0 * y1 + x1 * y0) % p for x0, x1, y0, y1 in zip(a0, a1, b0, b1)]
    assert c0 == exp0
    assert c1 == exp1

    ops = dv.Fp2Ops(spec)
    Inv, prod = jax.jit(lambda A: (iv := ops.inv(A), dv.fp2_mul(spec, A, iv))[0:2])(A)
    assert base.from_mont_host(np.asarray(prod[0])) == [1] * k
    assert base.from_mont_host(np.asarray(prod[1])) == [0] * k
