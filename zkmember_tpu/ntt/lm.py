"""Limb-major NTT: radix-2 constant-geometry transforms on (..., n, N) planes.

Same Pease dataflow as ntt.ntt (scan over log N identical stages, twiddle
table as scan input, one bit-reverse gather at the end) but with the
evaluation axis on the LANES and limbs on sublanes — the layout the
limb-major field core (fields.lm) requires.  ark-poly Radix2EvaluationDomain
parity (SURVEY.md section 2.2 ark-poly row).

The Groth16 H pipeline runs here as ONE jitted program over a stacked
(3, n, N) batch: iNTT x3 -> coset NTT x3 -> pointwise (AB - C) * Z^-1 ->
coset iNTT -> canonical limbs, all device-resident (the round-3 prover
round-tripped H through host bignums between two dispatches).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from zkmember_tpu.fields import lm
from zkmember_tpu.fields.device import FieldSpec
from zkmember_tpu.ntt.ntt import Domain


class DomainLM:
    """Device-resident limb-major twiddle/coset tables for one Domain.

    Built once per (field, size) and cached; tables are runtime inputs to
    the jitted cores so every domain size shares compiled programs of the
    same shape family."""

    _CACHE: dict = {}

    @classmethod
    def get(cls, spec: FieldSpec, size: int) -> "DomainLM":
        key = (spec.p, size)
        if key not in cls._CACHE:
            cls._CACHE[key] = cls(Domain.get(spec, size))
        return cls._CACHE[key]

    def __init__(self, domain: Domain):
        self.domain = domain
        self.spec = domain.spec
        self.size = domain.size
        # (log N, n, N/2) stage twiddles, forward + inverse
        self.tw_fwd = lm.to_lm(domain._twiddles(False))
        self.tw_inv = lm.to_lm(domain._twiddles(True))
        # (n, N) coset scale tables (inverse table folds in 1/N)
        self.coset_fwd = lm.to_lm(domain._coset_powers(False)[None])[0]
        self.coset_inv = lm.to_lm(domain._coset_powers(True)[None])[0]
        self.size_inv = lm.const_col(self.spec, domain.size_inv)
        self.perm = jnp.asarray(domain._perm)
        self.zh_coset_inv = lm.const_col(
            self.spec, pow(domain.vanishing_on_coset(), -1, self.spec.p)
        )

    def __hash__(self):
        return hash((self.spec.p, self.size, "lm"))

    def __eq__(self, o):
        return (
            isinstance(o, DomainLM)
            and (self.spec.p, self.size) == (o.spec.p, o.size)
        )


def _fft_core(spec: FieldSpec, x, twiddles, perm):
    """Pease radix-2 DIF along the last axis; x: (..., n, N) Montgomery."""
    N = x.shape[-1]
    half = N // 2

    def stage(y, tw):
        a = y[..., :half]
        b = y[..., half:]
        sm = lm.add(spec, a, b)
        df = lm.mont_mul(spec, lm.sub(spec, a, b), tw)
        out = jnp.stack([sm, df], axis=-1).reshape(y.shape)
        return out, None

    x, _ = lax.scan(stage, x, twiddles)
    return x[..., perm]


@partial(jax.jit, static_argnums=(0,))
def ntt(spec: FieldSpec, x, twiddles, perm):
    return _fft_core(spec, x, twiddles, perm)


@partial(jax.jit, static_argnums=(0,))
def h_pipeline(spec: FieldSpec, abc, tw_inv, tw_fwd, perm, coset_fwd, coset_inv, size_inv, zh_inv):
    """Stacked Groth16 H: abc (..., 3, n, N) mont evals -> (..., n, N)
    canonical coefficients of (A*B - C) / Z_H on the coset (extra leading
    axes batch independent proofs)."""
    x = _fft_core(spec, abc, tw_inv, perm)  # iNTT (unscaled)
    x = lm.mont_mul(spec, x, size_inv)  # 1/N
    x = lm.mont_mul(spec, x, coset_fwd)  # scale by g^i
    x = _fft_core(spec, x, tw_fwd, perm)  # coset evals
    xa = jnp.take(x, 0, axis=-3)
    xb = jnp.take(x, 1, axis=-3)
    xc = jnp.take(x, 2, axis=-3)
    ab = lm.mont_mul(spec, xa, xb)
    hh = lm.sub(spec, ab, xc)
    hh = lm.mont_mul(spec, hh, zh_inv)
    hh = _fft_core(spec, hh, tw_inv, perm)
    hh = lm.mont_mul(spec, hh, coset_inv)  # g^-i / N
    return lm.from_mont(spec, hh)  # canonical limbs (digit source for MSM)


def groth16_h(dlm: DomainLM, da, db, dc):
    """da/db/dc: (n, N) Montgomery matrix-eval planes -> canonical H limbs."""
    abc = jnp.stack([da, db, dc])
    return h_pipeline(
        dlm.spec,
        abc,
        dlm.tw_inv,
        dlm.tw_fwd,
        dlm.perm,
        dlm.coset_fwd,
        dlm.coset_inv,
        dlm.size_inv,
        dlm.zh_coset_inv,
    )


def groth16_h_batch(dlm: DomainLM, dabc):
    """dabc: (P, 3, n, N) Montgomery planes -> (P, n, N) canonical H limbs
    for P independent proofs in ONE program (the dp batch axis)."""
    return h_pipeline(
        dlm.spec,
        dabc,
        dlm.tw_inv,
        dlm.tw_fwd,
        dlm.perm,
        dlm.coset_fwd,
        dlm.coset_inv,
        dlm.size_inv,
        dlm.zh_coset_inv,
    )
