"""Radix-2 NTT / iNTT / coset-NTT over device limb planes.

TPU-native replacement for `ark-poly`'s Radix2EvaluationDomain FFTs — the
Groth16 H(x) pipeline and all Marlin AHP polynomial work (SURVEY.md section
2.2 row ark-poly; reference use sites benches/marlin.rs:99,232).

Design: constant-geometry (Pease) radix-2 DIF, `lax.scan`ned over the
log2(N) stages.  Every stage has IDENTICAL dataflow — split the butterfly
axis in half, butterfly `(a+b, (a-b)*w)`, perfect-shuffle the halves back
together — so XLA traces and compiles ONE stage body regardless of N (the
unrolled form produced O(log N)-sized HLO whose remote compile dominated
prover cold-start on the axon backend).  Per-stage twiddles are a stacked
(log N, N/2) Montgomery table scanned as input; output falls out in
bit-reversed order and a single gather restores natural order.  Twiddle
tables are built host-side from each field's two-adic root of unity
(derived in curves.bls12_381 / curves.bw6_761).

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

    # -- host-side constant tables (built once, shipped as scan inputs) -----
    def _twiddles(self, inverse: bool) -> np.ndarray:
        """Stacked Pease-stage twiddle table, shape (log N, N/2, n_limbs).

        Stage s of the constant-geometry DIF uses w^((i >> s) << s) at
        butterfly lane i (verified against the naive DFT; see module doc).
        """
        if inverse not in self._stage_tw:
            p, N = self.spec.p, self.size
            w = self.w_inv if inverse else self.w
            logn = N.bit_length() - 1
            stages = []
            for s in range(logn):
                # lane i uses w^((i >> s) << s): a geometric sequence in
                # w^(2^s) of length N/2^(s+1), each term repeated 2^s times
                # (incremental products -- pow() per lane was an O(N log N
                # log p) host hotspot that serialized prover warm-up)
                step = pow(w, 1 << s, p)
                count = N >> (s + 1)
                seq = [1] * count
                for k in range(1, count):
                    seq[k] = seq[k - 1] * step % p
                lane = [seq[i >> s] for i in range(N // 2)]
                stages.append(self.spec.to_mont_host(lane))
            self._stage_tw[inverse] = np.stack(stages)
        return self._stage_tw[inverse]

    def _coset_powers(self, inverse: bool) -> np.ndarray:
        if inverse not in self._coset_pows:
            p, N = self.spec.p, self.size
            g = self.coset_gen_inv if inverse else self.coset_gen
            seq = [self.size_inv if inverse else 1] * N
            for j in range(1, N):
                seq[j] = seq[j - 1] * g % p
            self._coset_pows[inverse] = self.spec.to_mont_host(seq)
        return self._coset_pows[inverse]

    def vanishing_on_coset(self) -> int:
        """Z_H(g x) = g^N - 1, constant across the coset."""
        return (pow(self.coset_gen, self.size, self.spec.p) - 1) % self.spec.p


def _fft_core(domain: Domain, x, inverse: bool):
    """Constant-geometry (Pease) radix-2 DIF over the last-but-one axis.

    x: (..., N, n_limbs) Montgomery-form values, natural order.  Returns the
    same shape in natural order.  The stage body is scanned, so the traced
    program is O(1) in N — critical for remote-compile latency.
    """
    spec, N = domain.spec, domain.size
    half = N // 2

    def stage(y, tw):
        a = y[..., :half, :]
        b = y[..., half:, :]
        sm = dv.add(spec, a, b)
        df = dv.mont_mul(spec, dv.sub(spec, a, b), jnp.broadcast_to(tw, a.shape))
        # perfect shuffle: lane i of each half -> lanes 2i, 2i+1
        out = jnp.stack([sm, df], axis=-2).reshape(y.shape)
        return out, None

    import jax

    x, _ = jax.lax.scan(stage, x, jnp.asarray(domain._twiddles(inverse)))
    # DIF leaves results bit-reversed; one gather restores natural order
    return x[..., jnp.asarray(domain._perm), :]


def _fft_core_axis(domain: Domain, x, axis: int, inverse: bool):
    """_fft_core along an arbitrary axis (limb axis stays last).

    Used by the multi-chip four-step NTT (parallel.dist.sharded_ntt), whose
    row/column transforms run along different axes of the (N1, N2) grid.
    """
    axis = axis % x.ndim
    if axis == x.ndim - 2:
        return _fft_core(domain, x, inverse)
    y = jnp.moveaxis(x, axis, -2)
    y = _fft_core(domain, y, inverse)
    return jnp.moveaxis(y, -2, axis)


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
