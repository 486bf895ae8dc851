"""Radix-2 NTT / iNTT / coset-NTT over device limb planes.

TPU-native replacement for `ark-poly`'s Radix2EvaluationDomain FFTs — the
Groth16 H(x) pipeline and all Marlin AHP polynomial work (SURVEY.md section
2.2 row ark-poly; reference use sites benches/marlin.rs:99,232).

Design: iterative Cooley-Tukey with a constant bit-reversal gather up front,
then log2(N) stages; every stage is ONE batched Montgomery multiply of N/2
elements by trace-time twiddle constants plus an add/sub pair — the whole
transform is a handful of fused VPU/MXU kernels per stage, with no
data-dependent control flow.  Twiddle tables are built host-side from each
field's two-adic root of unity (derived in curves.bls12_381 / curves.bw6_761).

Multi-chip sharding (parallel.dist) slices the leading batch dimension; the
butterfly axis itself is sharded via shard_map + all_to_all for domains
exceeding one chip (SURVEY.md section 7.1 item 3) — see parallel/dist.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from zkmember_tpu.fields import device as dv


def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


_DOMAIN_CACHE: dict = {}


class Domain:
    """Power-of-two evaluation domain over a device field.

    Mirrors ark-poly's Radix2EvaluationDomain: generator w of order N,
    vanishing polynomial Z(x) = x^N - 1, and a multiplicative coset with
    the field's multiplicative generator (used by the Groth16 H step).

    Use Domain.get() for a cached instance — Domain objects key jit caches
    (static args), so reuse avoids recompilation.
    """

    @classmethod
    def get(cls, spec: "dv.FieldSpec", size: int) -> "Domain":
        key = (spec.p, size)
        if key not in _DOMAIN_CACHE:
            _DOMAIN_CACHE[key] = cls(spec, size)
        return _DOMAIN_CACHE[key]

    def __init__(self, spec: dv.FieldSpec, size: int):
        assert size & (size - 1) == 0 and size >= 2
        two_adicity = getattr(spec, "two_adicity")
        assert size <= (1 << two_adicity), "domain too large for field 2-adicity"
        self.spec = spec
        self.size = size
        p = spec.p
        root = getattr(spec, "two_adic_root")  # order 2^two_adicity
        self.w = pow(root, (1 << two_adicity) // size, p)
        self.w_inv = pow(self.w, -1, p)
        self.size_inv = pow(size, -1, p)
        self.coset_gen = getattr(spec, "mult_gen")
        self.coset_gen_inv = pow(self.coset_gen, -1, p)
        self._perm = _bit_reverse_perm(size)
        self._stage_tw: dict[bool, list[np.ndarray]] = {}
        self._coset_pows: dict[bool, np.ndarray] = {}

    # -- host-side constant tables (built once, traced as constants) --------
    def _twiddles(self, inverse: bool) -> list[np.ndarray]:
        if inverse not in self._stage_tw:
            p, N = self.spec.p, self.size
            w = self.w_inv if inverse else self.w
            stages = []
            m = 1
            while m < N:
                base = pow(w, N // (2 * m), p)
                stages.append(
                    self.spec.to_mont_host([pow(base, j, p) for j in range(m)])
                )
                m *= 2
            self._stage_tw[inverse] = stages
        return self._stage_tw[inverse]

    def _coset_powers(self, inverse: bool) -> np.ndarray:
        if inverse not in self._coset_pows:
            p, N = self.spec.p, self.size
            g = self.coset_gen_inv if inverse else self.coset_gen
            scale = self.size_inv if inverse else 1
            self._coset_pows[inverse] = self.spec.to_mont_host(
                [pow(g, j, p) * scale % p for j in range(N)]
            )
        return self._coset_pows[inverse]

    def vanishing_on_coset(self) -> int:
        """Z_H(g x) = g^N - 1, constant across the coset."""
        return (pow(self.coset_gen, self.size, self.spec.p) - 1) % self.spec.p


def _fft_core(domain: Domain, x, inverse: bool):
    """In-place-style iterative radix-2 butterfly over the last-but-one axis.

    x: (..., N, n_limbs) Montgomery-form values.  Returns same shape.
    """
    spec, N = domain.spec, domain.size
    x = x[..., jnp.asarray(domain._perm), :]
    m = 1
    for tw in domain._twiddles(inverse):
        # shape (..., N/(2m), 2, m, n): even/odd blocks of the current stage
        shape = x.shape[:-2] + (N // (2 * m), 2, m, spec.n)
        xr = x.reshape(shape)
        even = xr[..., 0, :, :]
        odd = xr[..., 1, :, :]
        t = dv.mont_mul(spec, odd, jnp.broadcast_to(jnp.asarray(tw), odd.shape))
        out_even = dv.add(spec, even, t)
        out_odd = dv.sub(spec, even, t)
        x = jnp.concatenate(
            [out_even[..., :, None, :, :], out_odd[..., :, None, :, :]], axis=-3
        ).reshape(x.shape[:-2] + (N, spec.n))
        m *= 2
    return x


def ntt(domain: Domain, coeffs):
    """Coefficients -> evaluations over the domain (Montgomery form)."""
    return _fft_core(domain, coeffs, inverse=False)


def intt(domain: Domain, evals):
    """Evaluations -> coefficients: inverse NTT with 1/N scaling."""
    x = _fft_core(domain, evals, inverse=True)
    scale = jnp.asarray(domain.spec.mont_scalar(domain.size_inv))
    return dv.mont_mul(domain.spec, x, jnp.broadcast_to(scale, x.shape))


def coset_ntt(domain: Domain, coeffs):
    """Evaluations over the coset g*H: scale coeffs by g^i, then NTT."""
    pows = jnp.asarray(domain._coset_powers(inverse=False))
    scaled = dv.mont_mul(domain.spec, coeffs, jnp.broadcast_to(pows, coeffs.shape))
    return _fft_core(domain, scaled, inverse=False)


def coset_intt(domain: Domain, evals):
    """Inverse of coset_ntt: iNTT then scale by g^{-i}/N (fused table)."""
    x = _fft_core(domain, evals, inverse=True)
    pows = jnp.asarray(domain._coset_powers(inverse=True))  # g^{-i} * N^{-1}
    return dv.mont_mul(domain.spec, x, jnp.broadcast_to(pows, x.shape))
