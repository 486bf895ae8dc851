// Native host accelerator: fixed-width Montgomery arithmetic over 64-bit
// limbs, batch entry points consumed from Python via ctypes.
//
// Role in the framework: the host-side analog of the reference's ark-ff
// bigint backend with its x86_64 mulx/adx assembly path (SURVEY.md section
// 2.2 row 1, Cargo.lock ark-ff-asm) — the TPU owns the throughput math
// (fields/device.py), but the prover's host seams (sparse matrix·witness
// evaluation, canonical<->Montgomery conversion at the device boundary,
// Lagrange/QAP evaluation) would otherwise run as interpreted Python
// bignums and dominate small-proof latency.
//
// Widths shipped: 4/6/12 x 64-bit limbs = 256/384/768 bits, covering
// BLS12-381 Fr (255b) / Fq (381b), BW6-761 Fr (377b) / Fq (761b).
//
// Build: see zkmember_tpu/native/__init__.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;
typedef std::uint64_t u64;
typedef std::int64_t i64;

namespace {

// ---------------------------------------------------------------------------
// fixed-width limb primitives (little-endian limb order), templated on NL
// ---------------------------------------------------------------------------

template <int NL>
struct Fp {
  u64 v[NL];
};

template <int NL>
inline bool geq(const u64 *a, const u64 *b) {
  for (int i = NL - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;  // equal
}

template <int NL>
inline void sub_nocarry(u64 *a, const u64 *b) {  // a -= b (a >= b)
  u128 borrow = 0;
  for (int i = 0; i < NL; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

template <int NL>
inline u64 add_nocarry(u64 *a, const u64 *b) {  // a += b, returns carry
  u128 carry = 0;
  for (int i = 0; i < NL; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    a[i] = (u64)s;
    carry = s >> 64;
  }
  return (u64)carry;
}

// CIOS Montgomery multiplication: out = a*b*R^{-1} mod p, R = 2^(64*NL).
// `inv` = -p^{-1} mod 2^64.  Requires p < R/2 for carry headroom except the
// 761-bit BW6 Fq where p uses 761 of 768 bits — the classic CIOS bound
// p < R/4 fails there, so we keep an explicit extra carry limb `t[NL+1]`
// (the textbook algorithm), which is exact for any odd p < R.
template <int NL>
inline void mont_mul(u64 *out, const u64 *a, const u64 *b, const u64 *p,
                     u64 inv) {
  u64 t[NL + 2];
  std::memset(t, 0, sizeof(t));
  for (int i = 0; i < NL; ++i) {
    // t += a[i] * b
    u128 carry = 0;
    for (int j = 0; j < NL; ++j) {
      u128 s = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[NL] + carry;
    t[NL] = (u64)s;
    t[NL + 1] = (u64)(s >> 64);
    // m = t[0] * inv mod 2^64;  t += m * p;  t >>= 64
    u64 m = t[0] * inv;
    carry = ((u128)m * p[0] + t[0]) >> 64;
    for (int j = 1; j < NL; ++j) {
      u128 s2 = (u128)m * p[j] + t[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[NL] + carry;
    t[NL - 1] = (u64)s;
    t[NL] = t[NL + 1] + (u64)(s >> 64);
    t[NL + 1] = 0;
  }
  if (t[NL] || geq<NL>(t, p)) sub_nocarry<NL>(t, p);
  std::memcpy(out, t, NL * sizeof(u64));
}

template <int NL>
inline void add_mod(u64 *out, const u64 *a, const u64 *b, const u64 *p) {
  u64 t[NL];
  std::memcpy(t, a, sizeof(t));
  u64 carry = add_nocarry<NL>(t, b);
  if (carry || geq<NL>(t, p)) sub_nocarry<NL>(t, p);
  std::memcpy(out, t, sizeof(t));
}

template <int NL>
inline void sub_mod(u64 *out, const u64 *a, const u64 *b, const u64 *p) {
  u64 t[NL];
  std::memcpy(t, a, sizeof(t));
  if (!geq<NL>(a, b)) add_nocarry<NL>(t, p);
  sub_nocarry<NL>(t, b);
  std::memcpy(out, t, sizeof(t));
}

// out = a^e mod p (Montgomery in/out), e given as big-endian bit array.
template <int NL>
inline void mont_pow(u64 *out, const u64 *a, const std::uint8_t *ebits,
                     i64 nbits, const u64 *p, u64 inv, const u64 *one_mont) {
  u64 acc[NL];
  std::memcpy(acc, one_mont, sizeof(acc));
  for (i64 i = 0; i < nbits; ++i) {
    mont_mul<NL>(acc, acc, acc, p, inv);
    if (ebits[i]) mont_mul<NL>(acc, acc, a, p, inv);
  }
  std::memcpy(out, acc, NL * sizeof(u64));
}

// ---------------------------------------------------------------------------
// batch drivers (parallelized over a fixed thread pool)
// ---------------------------------------------------------------------------

inline int nthreads_for(i64 count) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  i64 per = 4096;  // don't spawn threads for tiny batches
  i64 want = (count + per - 1) / per;
  return (int)(want < (i64)hw ? (want < 1 ? 1 : want) : (i64)hw);
}

template <typename F>
inline void par_for(i64 count, F f) {
  int nt = nthreads_for(count);
  if (nt <= 1) {
    f((i64)0, count);
    return;
  }
  std::vector<std::thread> ts;
  i64 chunk = (count + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    i64 lo = t * chunk, hi = lo + chunk;
    if (hi > count) hi = count;
    if (lo >= hi) break;
    ts.emplace_back([=] { f(lo, hi); });
  }
  for (auto &th : ts) th.join();
}

template <int NL>
void mul_batch(i64 count, const u64 *a, const u64 *b, u64 *out, const u64 *p,
               u64 inv) {
  par_for(count, [&](i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i)
      mont_mul<NL>(out + i * NL, a + i * NL, b + i * NL, p, inv);
  });
}

// out[i] = a[i] * c (one constant), Montgomery domain
template <int NL>
void mul_const_batch(i64 count, const u64 *a, const u64 *c, u64 *out,
                     const u64 *p, u64 inv) {
  par_for(count, [&](i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i)
      mont_mul<NL>(out + i * NL, a + i * NL, c, p, inv);
  });
}

// CSR sparse matrix (Montgomery coeffs) times dense vector (Montgomery):
// out[r] = sum_{k in row r} coeffs[k] * z[cols[k]]  — the Groth16/Marlin
// witness evaluation <A_j, z> (SURVEY.md section 3.1 "witness synthesis").
template <int NL>
void csr_matvec(i64 rows, const i64 *indptr, const i64 *cols,
                const u64 *coeffs, const u64 *z, u64 *out, const u64 *p,
                u64 inv) {
  par_for(rows, [&](i64 lo, i64 hi) {
    u64 prod[NL];
    for (i64 r = lo; r < hi; ++r) {
      u64 acc[NL];
      std::memset(acc, 0, sizeof(acc));
      for (i64 k = indptr[r]; k < indptr[r + 1]; ++k) {
        mont_mul<NL>(prod, coeffs + k * NL, z + cols[k] * NL, p, inv);
        add_mod<NL>(acc, acc, prod, p);
      }
      std::memcpy(out + r * NL, acc, sizeof(acc));
    }
  });
}

// Batched modular inverse via Montgomery's trick + one Fermat inversion.
// In/out in Montgomery form; zero inputs are UB (callers filter).
template <int NL>
void batch_inv(i64 count, const u64 *a, u64 *out, const u64 *p, u64 inv,
               const u64 *one_mont, const std::uint8_t *pm2_bits, i64 nbits) {
  // prefix products
  std::vector<u64> prefix((count + 1) * NL);
  std::memcpy(prefix.data(), one_mont, NL * sizeof(u64));
  for (i64 i = 0; i < count; ++i)
    mont_mul<NL>(prefix.data() + (i + 1) * NL, prefix.data() + i * NL,
                 a + i * NL, p, inv);
  u64 run[NL];
  mont_pow<NL>(run, prefix.data() + count * NL, pm2_bits, nbits, p, inv,
               one_mont);
  for (i64 i = count - 1; i >= 0; --i) {
    mont_mul<NL>(out + i * NL, prefix.data() + i * NL, run, p, inv);
    mont_mul<NL>(run, run, a + i * NL, p, inv);
  }
}

template <int NL>
void pow_batch(i64 count, const u64 *a, const std::uint8_t *ebits, i64 nbits,
               u64 *out, const u64 *p, u64 inv, const u64 *one_mont) {
  par_for(count, [&](i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i)
      mont_pow<NL>(out + i * NL, a + i * NL, ebits, nbits, p, inv, one_mont);
  });
}

// Geometric sequence out[i] = base^i * scale (Montgomery), e.g. powers of
// tau for SRS/H-query scalars and the Lagrange w^j sequence.
template <int NL>
void geom_seq(i64 count, const u64 *base, const u64 *scale, u64 *out,
              const u64 *p, u64 inv) {
  if (count <= 0) return;
  std::memcpy(out, scale, NL * sizeof(u64));
  for (i64 i = 1; i < count; ++i)
    mont_mul<NL>(out + i * NL, out + (i - 1) * NL, base, p, inv);
}

template <int NL>
void add_batch(i64 count, const u64 *a, const u64 *b, u64 *out, const u64 *p) {
  par_for(count, [&](i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i)
      add_mod<NL>(out + i * NL, a + i * NL, b + i * NL, p);
  });
}

template <int NL>
void sub_batch(i64 count, const u64 *a, const u64 *b, u64 *out, const u64 *p) {
  par_for(count, [&](i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i)
      sub_mod<NL>(out + i * NL, a + i * NL, b + i * NL, p);
  });
}

// out[i] = c - a[i]  (constant minus array; the Marlin (alpha - row) shape)
template <int NL>
void rsub_const_batch(i64 count, const u64 *a, const u64 *c, u64 *out,
                      const u64 *p) {
  par_for(count, [&](i64 lo, i64 hi) {
    for (i64 i = lo; i < hi; ++i)
      sub_mod<NL>(out + i * NL, c, a + i * NL, p);
  });
}

// acc[i] += c * a[i]  (Montgomery) — the batched-opening quotient combiner.
template <int NL>
void mul_const_add_batch(i64 count, const u64 *a, const u64 *c, u64 *acc,
                         const u64 *p, u64 inv) {
  par_for(count, [&](i64 lo, i64 hi) {
    u64 prod[NL];
    for (i64 i = lo; i < hi; ++i) {
      mont_mul<NL>(prod, a + i * NL, c, p, inv);
      add_mod<NL>(acc + i * NL, acc + i * NL, prod, p);
    }
  });
}

// Synthetic division by (X - z): f (n coeffs, Montgomery) ->
// q (n-1 coeffs) with f = q*(X-z) + rem, rem = f(z).  Sequential Horner
// (the per-coefficient Python loop was the Marlin batched-opening hotspot
// at 2^20 coefficients).
template <int NL>
void synth_div(i64 n, const u64 *f, const u64 *z, u64 *q, u64 *rem,
               const u64 *p, u64 inv) {
  u64 acc[NL];
  std::memset(acc, 0, sizeof(acc));
  for (i64 i = n - 1; i >= 1; --i) {
    u64 t[NL];
    mont_mul<NL>(t, acc, z, p, inv);
    add_mod<NL>(t, t, f + i * NL, p);  // q[i-1] = f[i] + z*q[i]
    std::memcpy(q + (i - 1) * NL, t, sizeof(t));
    std::memcpy(acc, t, sizeof(t));
  }
  u64 t[NL];
  mont_mul<NL>(t, acc, z, p, inv);
  add_mod<NL>(t, t, f, p);  // rem = f[0] + z*q[0]
  std::memcpy(rem, t, NL * sizeof(u64));
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI (dispatch on nl). All arrays are little-endian u64 limbs, row-major
// (count, nl). Returns 0 on success, -1 on unsupported limb count.
// ---------------------------------------------------------------------------

#define DISPATCH(fn, ...)              \
  switch (nl) {                        \
    case 4:  fn<4>(__VA_ARGS__);  break; \
    case 6:  fn<6>(__VA_ARGS__);  break; \
    case 12: fn<12>(__VA_ARGS__); break; \
    default: return -1;                \
  }                                    \
  return 0;

extern "C" {

int zk_mont_mul(int nl, i64 count, const u64 *a, const u64 *b, u64 *out,
                const u64 *p, u64 inv) {
  DISPATCH(mul_batch, count, a, b, out, p, inv)
}

int zk_mont_mul_const(int nl, i64 count, const u64 *a, const u64 *c, u64 *out,
                      const u64 *p, u64 inv) {
  DISPATCH(mul_const_batch, count, a, c, out, p, inv)
}

int zk_csr_matvec(int nl, i64 rows, const i64 *indptr, const i64 *cols,
                  const u64 *coeffs, const u64 *z, u64 *out, const u64 *p,
                  u64 inv) {
  DISPATCH(csr_matvec, rows, indptr, cols, coeffs, z, out, p, inv)
}

int zk_batch_inv(int nl, i64 count, const u64 *a, u64 *out, const u64 *p,
                 u64 inv, const u64 *one_mont, const std::uint8_t *pm2_bits,
                 i64 nbits) {
  DISPATCH(batch_inv, count, a, out, p, inv, one_mont, pm2_bits, nbits)
}

int zk_mont_pow(int nl, i64 count, const u64 *a, const std::uint8_t *ebits,
                i64 nbits, u64 *out, const u64 *p, u64 inv,
                const u64 *one_mont) {
  DISPATCH(pow_batch, count, a, ebits, nbits, out, p, inv, one_mont)
}

int zk_geom_seq(int nl, i64 count, const u64 *base, const u64 *scale, u64 *out,
                const u64 *p, u64 inv) {
  DISPATCH(geom_seq, count, base, scale, out, p, inv)
}

int zk_add_mod(int nl, i64 count, const u64 *a, const u64 *b, u64 *out,
               const u64 *p) {
  DISPATCH(add_batch, count, a, b, out, p)
}

int zk_sub_mod(int nl, i64 count, const u64 *a, const u64 *b, u64 *out,
               const u64 *p) {
  DISPATCH(sub_batch, count, a, b, out, p)
}

int zk_rsub_const(int nl, i64 count, const u64 *a, const u64 *c, u64 *out,
                  const u64 *p) {
  DISPATCH(rsub_const_batch, count, a, c, out, p)
}

int zk_mul_const_add(int nl, i64 count, const u64 *a, const u64 *c, u64 *acc,
                     const u64 *p, u64 inv) {
  DISPATCH(mul_const_add_batch, count, a, c, acc, p, inv)
}

int zk_synth_div(int nl, i64 n, const u64 *f, const u64 *z, u64 *q, u64 *rem,
                 const u64 *p, u64 inv) {
  DISPATCH(synth_div, n, f, z, q, rem, p, inv)
}

}  // extern "C"
