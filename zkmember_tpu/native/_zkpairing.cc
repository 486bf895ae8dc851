// Native pairing engine: BLS12-381 optimal ate + BW6-761 Tate, host C++.
//
// TPU-native analog of ark-ec's pairing engines (SURVEY.md section 2.2 row
// 2; reference use sites /root/reference/src/commitments/pedersen381/mod.rs:14
// and pedersen761/mod.rs:12).  Verification is O(1) and belongs on the host;
// the round-4 pure-Python tower ran it at seconds per proof (VERDICT weak
// #3), so the Miller loops and final exponentiations run here on 64-bit
// Montgomery limbs instead.  The formulas mirror the (test-anchored) Python
// implementations in curves/bls12_381.py and curves/bw6_761.py one-for-one:
// affine line evaluation with fast binary-EGCD inversion, plain
// square-and-multiply hard part.  All curve constants (moduli, nonresidues,
// Frobenius gammas, loop/exponent bit strings) are PASSED IN from Python at
// init: C++ holds no curve-specific magic numbers.
//
// Exports (all return 0 on success):
//   zkp_bls_setup(q_limbs[6], e_hard_bits, n_bits, x_abs, gammas[6*2*6])
//   zkp_bls_multi_pairing(k, g1 (k*2*6 u64), g2 (k*2*2*6), out[12*6])
//   zkp_bw6_setup(q_limbs[12], nu[12], r_bits, n_rbits, e_hard_bits, n_ebits,
//                 gammas[6*12])
//   zkp_bw6_multi_pairing(k, g1 (k*2*12), g2 (k*2*12), out[6*12])
//
// Point coordinates and outputs are CANONICAL little-endian u64 limbs;
// Montgomery conversion happens inside.  Python filters out points at
// infinity before calling (a pair with an infinity contributes 1).

#include <cstdint>
#include <cstring>

typedef uint64_t u64;
typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// fixed-width big integers, N x u64 limbs, little-endian
// ---------------------------------------------------------------------------

template <int N> struct Ctx {
  u64 p[N];
  u64 inv;     // -p^{-1} mod 2^64
  u64 r2[N];   // R^2 mod p
  u64 one[N];  // R mod p (Montgomery 1)
};

template <int N> static inline int cmp_n(const u64 *a, const u64 *b) {
  for (int i = N - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
  }
  return 0;
}

template <int N> static inline bool is_zero_n(const u64 *a) {
  u64 acc = 0;
  for (int i = 0; i < N; ++i) acc |= a[i];
  return acc == 0;
}

template <int N> static inline u64 add_n(u64 *out, const u64 *a, const u64 *b) {
  u128 c = 0;
  for (int i = 0; i < N; ++i) {
    c += (u128)a[i] + b[i];
    out[i] = (u64)c;
    c >>= 64;
  }
  return (u64)c;
}

template <int N> static inline u64 sub_n(u64 *out, const u64 *a, const u64 *b) {
  u128 bor = 0;
  for (int i = 0; i < N; ++i) {
    u128 t = (u128)a[i] - b[i] - bor;
    out[i] = (u64)t;
    bor = (t >> 64) ? 1 : 0;
  }
  return (u64)bor;
}

// CIOS Montgomery multiplication: out = a*b*R^{-1} mod p.
template <int N>
static void mont_mul_n(const Ctx<N> &F, u64 *out, const u64 *a, const u64 *b) {
  u64 t[N + 2];
  for (int i = 0; i < N + 2; ++i) t[i] = 0;
  for (int i = 0; i < N; ++i) {
    u128 c = 0;
    for (int j = 0; j < N; ++j) {
      c = (u128)a[j] * b[i] + t[j] + (u64)c;
      t[j] = (u64)c;
      c >>= 64;
    }
    u128 c2 = (u128)t[N] + (u64)c;
    t[N] = (u64)c2;
    t[N + 1] = (u64)(c2 >> 64);
    u64 m = t[0] * F.inv;
    c = (u128)m * F.p[0] + t[0];
    c >>= 64;
    for (int j = 1; j < N; ++j) {
      c = (u128)m * F.p[j] + t[j] + (u64)c;
      t[j - 1] = (u64)c;
      c >>= 64;
    }
    c2 = (u128)t[N] + (u64)c;
    t[N - 1] = (u64)c2;
    t[N] = t[N + 1] + (u64)(c2 >> 64);
  }
  // t[0..N] holds the result (< 2p); conditional subtract
  if (t[N] || cmp_n<N>(t, F.p) >= 0) {
    sub_n<N>(out, t, F.p);
  } else {
    for (int i = 0; i < N; ++i) out[i] = t[i];
  }
}

template <int N>
static inline void add_mod_n(const Ctx<N> &F, u64 *out, const u64 *a, const u64 *b) {
  u64 carry = add_n<N>(out, a, b);
  if (carry || cmp_n<N>(out, F.p) >= 0) {
    u64 t[N];
    sub_n<N>(t, out, F.p);
    for (int i = 0; i < N; ++i) out[i] = t[i];
  }
}

template <int N>
static inline void sub_mod_n(const Ctx<N> &F, u64 *out, const u64 *a, const u64 *b) {
  if (sub_n<N>(out, a, b)) {
    u64 t[N];
    add_n<N>(t, out, F.p);
    for (int i = 0; i < N; ++i) out[i] = t[i];
  }
}

template <int N> static inline void neg_mod_n(const Ctx<N> &F, u64 *out, const u64 *a) {
  if (is_zero_n<N>(a)) {
    for (int i = 0; i < N; ++i) out[i] = 0;
  } else {
    sub_n<N>(out, F.p, a);
  }
}

template <int N> static inline bool is_odd_n(const u64 *a) { return a[0] & 1; }

template <int N> static inline void shr1_n(u64 *a) {
  for (int i = 0; i < N - 1; ++i) a[i] = (a[i] >> 1) | (a[i + 1] << 63);
  a[N - 1] >>= 1;
}

// Binary extended GCD inverse of a Montgomery-form element: returns
// Montgomery form of the inverse.  ~2*bits iterations of shift/sub on
// N-limb values — orders of magnitude cheaper than a Fermat ladder at
// N=12 (761-bit BW6 field).
template <int N>
static void inv_mont_n(const Ctx<N> &F, u64 *out, const u64 *a_mont) {
  // classical binary extended Euclid on (u, v) = (a, p):
  //   invariant u = x1 * a (mod p), v = x2 * a (mod p)
  u64 u[N], v[N], x1[N], x2[N];
  for (int i = 0; i < N; ++i) {
    u[i] = a_mont[i];
    v[i] = F.p[i];
    x1[i] = 0;
    x2[i] = 0;
  }
  x1[0] = 1;
  if (is_zero_n<N>(u)) {  // inv(0) := 0 (callers guard; mirrors Python raise)
    for (int i = 0; i < N; ++i) out[i] = 0;
    return;
  }
  u64 onebuf[N];
  for (int i = 0; i < N; ++i) onebuf[i] = 0;
  onebuf[0] = 1;
  while (cmp_n<N>(u, onebuf) != 0 && cmp_n<N>(v, onebuf) != 0) {
    while (!is_odd_n<N>(u)) {
      shr1_n<N>(u);
      if (is_odd_n<N>(x1)) add_n<N>(x1, x1, F.p);  // carry folds into shift
      // note: x1 may momentarily exceed p; the final reduction handles it.
      shr1_n<N>(x1);
    }
    while (!is_odd_n<N>(v)) {
      shr1_n<N>(v);
      if (is_odd_n<N>(x2)) add_n<N>(x2, x2, F.p);
      shr1_n<N>(x2);
    }
    if (cmp_n<N>(u, v) >= 0) {
      sub_n<N>(u, u, v);
      sub_mod_n<N>(F, x1, x1, x2);
    } else {
      sub_n<N>(v, v, u);
      sub_mod_n<N>(F, x2, x2, x1);
    }
  }
  u64 *x = (cmp_n<N>(u, onebuf) == 0) ? x1 : x2;
  while (cmp_n<N>(x, F.p) >= 0) sub_n<N>(x, x, F.p);
  // x = (a_mont)^{-1} = a^{-1} R^{-1}; two R^2 factors restore Montgomery form
  u64 t[N];
  mont_mul_n<N>(F, t, x, F.r2);    // a^{-1} R^{-1} * R^2 R^{-1} = a^{-1}
  mont_mul_n<N>(F, out, t, F.r2);  // a^{-1} * R^2 R^{-1} = a^{-1} R
}

template <int N> static void ctx_init(Ctx<N> &F, const u64 *p) {
  for (int i = 0; i < N; ++i) F.p[i] = p[i];
  // inv = -p^{-1} mod 2^64 via Newton iteration
  u64 x = p[0];
  for (int i = 0; i < 6; ++i) x *= 2 - p[0] * x;  // x = p0^{-1} mod 2^64
  F.inv = (u64)(0 - x);
  // one = R mod p: start from 1, double 64*N times mod p
  u64 one[N];
  for (int i = 0; i < N; ++i) one[i] = 0;
  one[0] = 1;
  for (int i = 0; i < 64 * N; ++i) add_mod_n<N>(F, one, one, one);
  for (int i = 0; i < N; ++i) F.one[i] = one[i];
  // r2 = R^2 mod p: double R mod p another 64*N times
  u64 r2[N];
  for (int i = 0; i < N; ++i) r2[i] = one[i];
  for (int i = 0; i < 64 * N; ++i) add_mod_n<N>(F, r2, r2, r2);
  for (int i = 0; i < N; ++i) F.r2[i] = r2[i];
}

// ===========================================================================
// BLS12-381 tower:  Fq2 = Fq[u]/(u^2+1);  Fq6 = Fq2[v]/(v^3 - (u+1));
//                   Fq12 = Fq6[w]/(w^2 - v)
// (mirrors curves/bls12_381.py:40-45)
// ===========================================================================

static Ctx<6> BLS;

struct Fq { u64 l[6]; };
struct Fq2 { Fq c0, c1; };
struct Fq6 { Fq2 c0, c1, c2; };
struct Fq12 { Fq6 c0, c1; };

static inline void f_add(Fq &o, const Fq &a, const Fq &b) { add_mod_n<6>(BLS, o.l, a.l, b.l); }
static inline void f_sub(Fq &o, const Fq &a, const Fq &b) { sub_mod_n<6>(BLS, o.l, a.l, b.l); }
static inline void f_mul(Fq &o, const Fq &a, const Fq &b) { mont_mul_n<6>(BLS, o.l, a.l, b.l); }
static inline void f_neg(Fq &o, const Fq &a) { neg_mod_n<6>(BLS, o.l, a.l); }
static inline void f_inv(Fq &o, const Fq &a) { inv_mont_n<6>(BLS, o.l, a.l); }
static inline bool f_is0(const Fq &a) { return is_zero_n<6>(a.l); }
static inline void f_set0(Fq &o) { memset(o.l, 0, sizeof(o.l)); }
static inline void f_set1(Fq &o) { memcpy(o.l, BLS.one, sizeof(o.l)); }

// Fq2, nonresidue -1 (u^2 = -1)
static inline void f2_add(Fq2 &o, const Fq2 &a, const Fq2 &b) { f_add(o.c0, a.c0, b.c0); f_add(o.c1, a.c1, b.c1); }
static inline void f2_sub(Fq2 &o, const Fq2 &a, const Fq2 &b) { f_sub(o.c0, a.c0, b.c0); f_sub(o.c1, a.c1, b.c1); }
static inline void f2_neg(Fq2 &o, const Fq2 &a) { f_neg(o.c0, a.c0); f_neg(o.c1, a.c1); }
static inline void f2_conj(Fq2 &o, const Fq2 &a) { o.c0 = a.c0; f_neg(o.c1, a.c1); }
static inline bool f2_is0(const Fq2 &a) { return f_is0(a.c0) && f_is0(a.c1); }
static inline void f2_set0(Fq2 &o) { f_set0(o.c0); f_set0(o.c1); }
static inline void f2_set1(Fq2 &o) { f_set1(o.c0); f_set0(o.c1); }

static void f2_mul(Fq2 &o, const Fq2 &a, const Fq2 &b) {
  // Karatsuba: (a0+a1 u)(b0+b1 u) = (a0b0 - a1b1) + ((a0+a1)(b0+b1)-a0b0-a1b1) u
  Fq v0, v1, s, t, r0;
  f_mul(v0, a.c0, b.c0);
  f_mul(v1, a.c1, b.c1);
  f_add(s, a.c0, a.c1);
  f_add(t, b.c0, b.c1);
  f_sub(r0, v0, v1);
  Fq st;
  f_mul(st, s, t);
  f_sub(st, st, v0);
  f_sub(o.c1, st, v1);
  o.c0 = r0;
}

static void f2_sqr(Fq2 &o, const Fq2 &a) {
  // (a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
  Fq s, d, m;
  f_add(s, a.c0, a.c1);
  f_sub(d, a.c0, a.c1);
  f_mul(m, a.c0, a.c1);
  f_mul(o.c0, s, d);
  f_add(o.c1, m, m);
}

static void f2_inv(Fq2 &o, const Fq2 &a) {
  // (a0 - a1 u) / (a0^2 + a1^2)
  Fq n0, n1, n, ni;
  f_mul(n0, a.c0, a.c0);
  f_mul(n1, a.c1, a.c1);
  f_add(n, n0, n1);
  f_inv(ni, n);
  f_mul(o.c0, a.c0, ni);
  Fq t;
  f_mul(t, a.c1, ni);
  f_neg(o.c1, t);
}

static inline void f2_mul_fq(Fq2 &o, const Fq2 &a, const Fq &b) {
  f_mul(o.c0, a.c0, b);
  f_mul(o.c1, a.c1, b);
}

// multiply by xi = u + 1:  (a0 + a1 u)(1 + u) = (a0 - a1) + (a0 + a1) u
static inline void f2_mul_xi(Fq2 &o, const Fq2 &a) {
  Fq t0, t1;
  f_sub(t0, a.c0, a.c1);
  f_add(t1, a.c0, a.c1);
  o.c0 = t0;
  o.c1 = t1;
}

// Fq6 cubic over Fq2 with v^3 = xi
static inline void f6_add(Fq6 &o, const Fq6 &a, const Fq6 &b) { f2_add(o.c0, a.c0, b.c0); f2_add(o.c1, a.c1, b.c1); f2_add(o.c2, a.c2, b.c2); }
static inline void f6_sub(Fq6 &o, const Fq6 &a, const Fq6 &b) { f2_sub(o.c0, a.c0, b.c0); f2_sub(o.c1, a.c1, b.c1); f2_sub(o.c2, a.c2, b.c2); }
static inline void f6_neg(Fq6 &o, const Fq6 &a) { f2_neg(o.c0, a.c0); f2_neg(o.c1, a.c1); f2_neg(o.c2, a.c2); }
static inline void f6_set0(Fq6 &o) { f2_set0(o.c0); f2_set0(o.c1); f2_set0(o.c2); }
static inline void f6_set1(Fq6 &o) { f2_set1(o.c0); f2_set0(o.c1); f2_set0(o.c2); }

static void f6_mul(Fq6 &o, const Fq6 &a, const Fq6 &b) {
  // cubic Karatsuba (6 Fq2 muls): v_i = a_i b_i;
  //   c0 = v0 + xi ((a1+a2)(b1+b2) - v1 - v2)
  //   c1 = (a0+a1)(b0+b1) - v0 - v1 + xi v2
  //   c2 = (a0+a2)(b0+b2) - v0 - v2 + v1
  Fq2 v0, v1, v2, s, t, m, r0, r1, r2;
  f2_mul(v0, a.c0, b.c0);
  f2_mul(v1, a.c1, b.c1);
  f2_mul(v2, a.c2, b.c2);
  f2_add(s, a.c1, a.c2);
  f2_add(t, b.c1, b.c2);
  f2_mul(m, s, t);
  f2_sub(m, m, v1);
  f2_sub(m, m, v2);
  f2_mul_xi(m, m);
  f2_add(r0, v0, m);
  f2_add(s, a.c0, a.c1);
  f2_add(t, b.c0, b.c1);
  f2_mul(m, s, t);
  f2_sub(m, m, v0);
  f2_sub(m, m, v1);
  f2_mul_xi(t, v2);
  f2_add(r1, m, t);
  f2_add(s, a.c0, a.c2);
  f2_add(t, b.c0, b.c2);
  f2_mul(m, s, t);
  f2_sub(m, m, v0);
  f2_sub(m, m, v2);
  f2_add(r2, m, v1);
  o.c0 = r0;
  o.c1 = r1;
  o.c2 = r2;
}

static void f6_sqr(Fq6 &o, const Fq6 &a) { f6_mul(o, a, a); }

static inline void f6_mul_fq2(Fq6 &o, const Fq6 &a, const Fq2 &b) {
  f2_mul(o.c0, a.c0, b);
  f2_mul(o.c1, a.c1, b);
  f2_mul(o.c2, a.c2, b);
}

// multiply by v (shift up with x^3 = xi)
static inline void f6_mul_v(Fq6 &o, const Fq6 &a) {
  Fq2 t;
  f2_mul_xi(t, a.c2);
  Fq2 n0 = t, n1 = a.c0, n2 = a.c1;
  o.c0 = n0;
  o.c1 = n1;
  o.c2 = n2;
}

static void f6_inv(Fq6 &o, const Fq6 &a) {
  // host.py ExtElement.inv degree-3 branch
  Fq2 t0, t1, t2, n, t, ni;
  f2_sqr(t0, a.c0);
  f2_mul(t, a.c1, a.c2);
  f2_mul_xi(t, t);
  f2_sub(t0, t0, t);  // a0^2 - xi a1 a2
  f2_sqr(t1, a.c2);
  f2_mul_xi(t1, t1);
  f2_mul(t, a.c0, a.c1);
  f2_sub(t1, t1, t);  // xi a2^2 - a0 a1
  f2_sqr(t2, a.c1);
  f2_mul(t, a.c0, a.c2);
  f2_sub(t2, t2, t);  // a1^2 - a0 a2
  // norm = a0 t0 + xi a2 t1 + xi a1 t2
  Fq2 n1, n2;
  f2_mul(n, a.c0, t0);
  f2_mul(n1, a.c2, t1);
  f2_mul_xi(n1, n1);
  f2_add(n, n, n1);
  f2_mul(n2, a.c1, t2);
  f2_mul_xi(n2, n2);
  f2_add(n, n, n2);
  f2_inv(ni, n);
  f2_mul(o.c0, t0, ni);
  f2_mul(o.c1, t1, ni);
  f2_mul(o.c2, t2, ni);
}

// Fq12 quadratic over Fq6 with w^2 = v
static inline void f12_set1(Fq12 &o) { f6_set1(o.c0); f6_set0(o.c1); }
static inline void f12_conj(Fq12 &o, const Fq12 &a) { o.c0 = a.c0; f6_neg(o.c1, a.c1); }

static void f12_mul(Fq12 &o, const Fq12 &a, const Fq12 &b) {
  // (a0 + a1 w)(b0 + b1 w) = (a0b0 + v a1b1) + (a0b1 + a1b0) w  [Karatsuba]
  Fq6 v0, v1, sa, sb, t, vv;
  f6_mul(v0, a.c0, b.c0);
  f6_mul(v1, a.c1, b.c1);
  f6_add(sa, a.c0, a.c1);
  f6_add(sb, b.c0, b.c1);
  f6_mul(t, sa, sb);
  f6_sub(t, t, v0);
  f6_sub(t, t, v1);
  f6_mul_v(vv, v1);
  f6_add(o.c0, v0, vv);
  o.c1 = t;
}

static void f12_sqr(Fq12 &o, const Fq12 &a) {
  // complex squaring: c0 = (a0+a1)(a0+v a1) - m - v m, c1 = 2m, m = a0 a1
  Fq6 m, s, t, va1, vm;
  f6_mul(m, a.c0, a.c1);
  f6_add(s, a.c0, a.c1);
  f6_mul_v(va1, a.c1);
  f6_add(va1, va1, a.c0);
  f6_mul(t, s, va1);
  f6_sub(t, t, m);
  f6_mul_v(vm, m);
  f6_sub(t, t, vm);
  o.c0 = t;
  f6_add(o.c1, m, m);
}

static void f12_inv(Fq12 &o, const Fq12 &a) {
  // (a0 - a1 w) / (a0^2 - v a1^2)
  Fq6 s0, s1, n, ni, t;
  f6_sqr(s0, a.c0);
  f6_sqr(s1, a.c1);
  f6_mul_v(t, s1);
  f6_sub(n, s0, t);
  f6_inv(ni, n);
  f6_mul(o.c0, a.c0, ni);
  f6_mul(t, a.c1, ni);
  f6_neg(o.c1, t);
}

// Frobenius: gammas[k] = xi^{k (q-1)/6} in Fq2, k = 0..5 (passed from Python)
static Fq2 BLS_GAMMA[6];

static void f12_frob(Fq12 &o, const Fq12 &a) {
  // (c * w^k)^q = conj(c) * gamma_k * w^k   (bls12_381.py:148-159)
  Fq2 t;
  const Fq2 *A[3] = {&a.c0.c0, &a.c0.c1, &a.c0.c2};
  const Fq2 *B[3] = {&a.c1.c0, &a.c1.c1, &a.c1.c2};
  Fq2 *OA[3] = {&o.c0.c0, &o.c0.c1, &o.c0.c2};
  Fq2 *OB[3] = {&o.c1.c0, &o.c1.c1, &o.c1.c2};
  for (int i = 0; i < 3; ++i) {
    f2_conj(t, *A[i]);
    f2_mul(*OA[i], t, BLS_GAMMA[2 * i]);
    f2_conj(t, *B[i]);
    f2_mul(*OB[i], t, BLS_GAMMA[2 * i + 1]);
  }
}

// ---------------------------------------------------------------------------
// BLS12-381 Miller loop (mirrors bls12_381.py:88-122: affine twist
// arithmetic), run in LOCKSTEP over all k pairs so the per-step slope
// denominators share one batched inversion (Montgomery's trick) — all pairs
// follow the same loop-bit branch sequence, so the steps align exactly.
// ---------------------------------------------------------------------------

#define ZKP_MAXK 16

struct G1Aff { Fq x, y; };
struct G2Aff { Fq2 x, y; };

static u64 BLS_X_ABS;       // |x| loop bound (positive)
static uint8_t *BLS_ED;     // hard-part exponent, 4 base-q digits x nd bits
static int BLS_ED_N;        // bits per digit (MSB first, common length)

static void f2_batch_inv(Fq2 *out, const Fq2 *in, int k) {
  Fq2 pref[ZKP_MAXK + 1];
  f2_set1(pref[0]);
  for (int i = 0; i < k; ++i) f2_mul(pref[i + 1], pref[i], in[i]);
  Fq2 inv_all;
  f2_inv(inv_all, pref[k]);
  for (int i = k - 1; i >= 0; --i) {
    f2_mul(out[i], pref[i], inv_all);
    Fq2 t;
    f2_mul(t, inv_all, in[i]);
    inv_all = t;
  }
}

// line through T (and Q for the add step) at P given the slope lam;
// line = (lam x_T - y_T) + (-lam x_P) v + y_P v w  (bls12_381.py:74-105)
static void bls_line_lam(Fq12 &line, G2Aff &Tout, const G2Aff &T,
                         const G2Aff &Q, const G1Aff &P, const Fq2 &lam) {
  Fq2 l2, x3, y3, t;
  f2_sqr(l2, lam);
  f2_sub(x3, l2, T.x);
  f2_sub(x3, x3, Q.x);
  f2_sub(t, T.x, x3);
  f2_mul(y3, lam, t);
  f2_sub(y3, y3, T.y);
  Fq2 c0, c1, c2;
  f2_mul(c0, lam, T.x);
  f2_sub(c0, c0, T.y);
  Fq2 xp2;
  xp2.c0 = P.x;
  f_set0(xp2.c1);
  f2_mul(c1, lam, xp2);
  f2_neg(c1, c1);
  f2_set0(c2);
  c2.c0 = P.y;
  Tout.x = x3;
  Tout.y = y3;
  f6_set0(line.c0);
  f6_set0(line.c1);
  line.c0.c0 = c0;
  line.c0.c1 = c1;
  line.c1.c1 = c2;
}

static void bls_miller_multi(Fq12 &fout, int k, const G1Aff *P,
                             const G2Aff *Q) {
  Fq12 f[ZKP_MAXK];
  G2Aff T[ZKP_MAXK];
  for (int i = 0; i < k; ++i) {
    f12_set1(f[i]);
    T[i] = Q[i];
  }
  Fq2 den[ZKP_MAXK], dinv[ZKP_MAXK], lam;
  u64 u = BLS_X_ABS;
  int top = 63;
  while (!((u >> top) & 1)) --top;
  for (int bit = top - 1; bit >= 0; --bit) {
    // double step: lam_i = 3 x_i^2 / 2 y_i, shared batch inversion
    for (int i = 0; i < k; ++i) f2_add(den[i], T[i].y, T[i].y);
    f2_batch_inv(dinv, den, k);
    for (int i = 0; i < k; ++i) {
      Fq2 x2, num;
      f2_sqr(x2, T[i].x);
      f2_add(num, x2, x2);
      f2_add(num, num, x2);
      f2_mul(lam, num, dinv[i]);
      Fq12 line, t;
      G2Aff T2;
      bls_line_lam(line, T2, T[i], T[i], P[i], lam);
      T[i] = T2;
      f12_sqr(t, f[i]);
      f12_mul(f[i], t, line);
    }
    if ((u >> bit) & 1) {
      for (int i = 0; i < k; ++i) f2_sub(den[i], Q[i].x, T[i].x);
      f2_batch_inv(dinv, den, k);
      for (int i = 0; i < k; ++i) {
        Fq2 num;
        f2_sub(num, Q[i].y, T[i].y);
        f2_mul(lam, num, dinv[i]);
        Fq12 line, t;
        G2Aff T2;
        bls_line_lam(line, T2, T[i], Q[i], P[i], lam);
        T[i] = T2;
        f12_mul(t, f[i], line);
        f[i] = t;
      }
    }
  }
  // product of the k Miller values; x < 0: conjugate (bls12_381.py:121-122)
  Fq12 acc = f[0];
  for (int i = 1; i < k; ++i) {
    Fq12 t;
    f12_mul(t, acc, f[i]);
    acc = t;
  }
  f12_conj(fout, acc);
}

// hard part f^e_hard via base-q multi-exponentiation: e_hard = sum l_i q^i,
// f^(q^i) = Frobenius (cheap), one shared Straus ladder over the 4 digits —
// exactly the same exponent as the Python oracle, ~5x fewer operations than
// a flat 2788-bit square-and-multiply.
static void bls_hard_part(Fq12 &out, const Fq12 &e) {
  Fq12 g[4];
  g[0] = e;
  f12_frob(g[1], g[0]);
  f12_frob(g[2], g[1]);
  f12_frob(g[3], g[2]);
  Fq12 table[16];
  f12_set1(table[0]);
  for (int s = 1; s < 16; ++s) {
    int i = __builtin_ctz(s);
    if (s == (1 << i)) {
      table[s] = g[i];
    } else {
      f12_mul(table[s], table[s ^ (1 << i)], g[i]);
    }
  }
  Fq12 acc;
  f12_set1(acc);
  for (int j = 0; j < BLS_ED_N; ++j) {
    Fq12 t;
    f12_sqr(t, acc);
    int idx = 0;
    for (int i = 0; i < 4; ++i) idx |= (int)BLS_ED[i * BLS_ED_N + j] << i;
    if (idx) {
      f12_mul(acc, t, table[idx]);
    } else {
      acc = t;
    }
  }
  out = acc;
}

static void bls_final_exp(Fq12 &out, const Fq12 &f_in) {
  // easy: f^(q^6-1) = conj(f) * f^{-1}; then f^(q^2+1)
  Fq12 f1, fi, f2, fr;
  f12_conj(f1, f_in);
  f12_inv(fi, f_in);
  f12_mul(f2, f1, fi);
  f12_frob(fr, f2);
  Fq12 fr2;
  f12_frob(fr2, fr);
  Fq12 e;
  f12_mul(e, fr2, f2);
  bls_hard_part(out, e);
}

// ---------------------------------------------------------------------------
// BLS12-381 exported API
// ---------------------------------------------------------------------------

extern "C" int zkp_bls_setup(const u64 *q_limbs, const uint8_t *e_digit_bits,
                             int n_bits, u64 x_abs, const u64 *gammas_canon) {
  // e_digit_bits: 4 x n_bits matrix — base-q digits of the hard exponent,
  // each MSB-first, common bit length n_bits
  ctx_init<6>(BLS, q_limbs);
  BLS_X_ABS = x_abs;
  if (BLS_ED) delete[] BLS_ED;
  BLS_ED = new uint8_t[4 * n_bits];
  memcpy(BLS_ED, e_digit_bits, 4 * n_bits);
  BLS_ED_N = n_bits;
  // gammas: 6 Fq2 values = 6 * 2 * 6 u64, canonical -> Montgomery
  for (int k = 0; k < 6; ++k) {
    for (int c = 0; c < 2; ++c) {
      u64 tmp[6];
      const u64 *src = gammas_canon + (k * 2 + c) * 6;
      mont_mul_n<6>(BLS, tmp, src, BLS.r2);
      Fq *dst = c == 0 ? &BLS_GAMMA[k].c0 : &BLS_GAMMA[k].c1;
      memcpy(dst->l, tmp, sizeof(tmp));
    }
  }
  return 0;
}

extern "C" int zkp_bls_multi_pairing(int k, const u64 *g1, const u64 *g2,
                                     u64 *out) {
  Fq12 acc;
  f12_set1(acc);
  for (int base = 0; base < k || base == 0; base += ZKP_MAXK) {
    int kk = k - base;
    if (kk > ZKP_MAXK) kk = ZKP_MAXK;
    if (kk <= 0) break;
    G1Aff P[ZKP_MAXK];
    G2Aff Q[ZKP_MAXK];
    for (int j = 0; j < kk; ++j) {
      int i = base + j;
      mont_mul_n<6>(BLS, P[j].x.l, g1 + i * 12, BLS.r2);
      mont_mul_n<6>(BLS, P[j].y.l, g1 + i * 12 + 6, BLS.r2);
      mont_mul_n<6>(BLS, Q[j].x.c0.l, g2 + i * 24, BLS.r2);
      mont_mul_n<6>(BLS, Q[j].x.c1.l, g2 + i * 24 + 6, BLS.r2);
      mont_mul_n<6>(BLS, Q[j].y.c0.l, g2 + i * 24 + 12, BLS.r2);
      mont_mul_n<6>(BLS, Q[j].y.c1.l, g2 + i * 24 + 18, BLS.r2);
    }
    Fq12 f, t;
    bls_miller_multi(f, kk, P, Q);
    f12_mul(t, acc, f);
    acc = t;
  }
  Fq12 r;
  bls_final_exp(r, acc);
  // serialize canonical: order (c0.c0.c0, c0.c0.c1, c0.c1.c0, ... c1.c2.c1)
  const Fq *coords[12] = {&r.c0.c0.c0, &r.c0.c0.c1, &r.c0.c1.c0, &r.c0.c1.c1,
                          &r.c0.c2.c0, &r.c0.c2.c1, &r.c1.c0.c0, &r.c1.c0.c1,
                          &r.c1.c1.c0, &r.c1.c1.c1, &r.c1.c2.c0, &r.c1.c2.c1};
  u64 onebuf[6] = {1, 0, 0, 0, 0, 0};
  for (int i = 0; i < 12; ++i) {
    mont_mul_n<6>(BLS, out + i * 6, coords[i]->l, onebuf);  // from Montgomery
  }
  return 0;
}

// ===========================================================================
// BW6-761 tower:  Fq3 = Fq[v]/(v^3 - nu);  Fq6 = Fq3[w]/(w^2 - v)
// (mirrors curves/bw6_761.py:110-120);  Tate Miller loop over G1 points.
// ===========================================================================

static Ctx<12> BW6;

struct Bq { u64 l[12]; };
struct Bq3 { Bq c0, c1, c2; };
struct Bq6 { Bq3 c0, c1; };

static Bq BW6_NU;        // Montgomery
static Bq BW6_GAMMA[6];  // nu^{k(q-1)/6}, Montgomery
static uint8_t *BW6_RBITS;
static int BW6_RBITS_N;
static uint8_t *BW6_ED;  // hard-part exponent, 2 base-q digits x nd bits
static int BW6_ED_N;

static inline void b_add(Bq &o, const Bq &a, const Bq &b) { add_mod_n<12>(BW6, o.l, a.l, b.l); }
static inline void b_sub(Bq &o, const Bq &a, const Bq &b) { sub_mod_n<12>(BW6, o.l, a.l, b.l); }
static inline void b_mul(Bq &o, const Bq &a, const Bq &b) { mont_mul_n<12>(BW6, o.l, a.l, b.l); }
static inline void b_neg(Bq &o, const Bq &a) { neg_mod_n<12>(BW6, o.l, a.l); }
static inline void b_inv(Bq &o, const Bq &a) { inv_mont_n<12>(BW6, o.l, a.l); }
static inline bool b_is0(const Bq &a) { return is_zero_n<12>(a.l); }
static inline void b_set0(Bq &o) { memset(o.l, 0, sizeof(o.l)); }
static inline void b_set1(Bq &o) { memcpy(o.l, BW6.one, sizeof(o.l)); }
static inline void b_mul_nu(Bq &o, const Bq &a) { b_mul(o, a, BW6_NU); }

static inline void b3_add(Bq3 &o, const Bq3 &a, const Bq3 &b) { b_add(o.c0, a.c0, b.c0); b_add(o.c1, a.c1, b.c1); b_add(o.c2, a.c2, b.c2); }
static inline void b3_sub(Bq3 &o, const Bq3 &a, const Bq3 &b) { b_sub(o.c0, a.c0, b.c0); b_sub(o.c1, a.c1, b.c1); b_sub(o.c2, a.c2, b.c2); }
static inline void b3_neg(Bq3 &o, const Bq3 &a) { b_neg(o.c0, a.c0); b_neg(o.c1, a.c1); b_neg(o.c2, a.c2); }
static inline void b3_set0(Bq3 &o) { b_set0(o.c0); b_set0(o.c1); b_set0(o.c2); }
static inline void b3_set1(Bq3 &o) { b_set1(o.c0); b_set0(o.c1); b_set0(o.c2); }

static void b3_mul(Bq3 &o, const Bq3 &a, const Bq3 &b) {
  // cubic Karatsuba (6 Fq muls + 2 nu muls); see f6_mul
  Bq v0, v1, v2, s, t, m, r0, r1, r2;
  b_mul(v0, a.c0, b.c0);
  b_mul(v1, a.c1, b.c1);
  b_mul(v2, a.c2, b.c2);
  b_add(s, a.c1, a.c2);
  b_add(t, b.c1, b.c2);
  b_mul(m, s, t);
  b_sub(m, m, v1);
  b_sub(m, m, v2);
  b_mul_nu(m, m);
  b_add(r0, v0, m);
  b_add(s, a.c0, a.c1);
  b_add(t, b.c0, b.c1);
  b_mul(m, s, t);
  b_sub(m, m, v0);
  b_sub(m, m, v1);
  b_mul_nu(t, v2);
  b_add(r1, m, t);
  b_add(s, a.c0, a.c2);
  b_add(t, b.c0, b.c2);
  b_mul(m, s, t);
  b_sub(m, m, v0);
  b_sub(m, m, v2);
  b_add(r2, m, v1);
  o.c0 = r0;
  o.c1 = r1;
  o.c2 = r2;
}

static void b3_inv(Bq3 &o, const Bq3 &a) {
  Bq t0, t1, t2, n, t, ni;
  b_mul(t0, a.c0, a.c0);
  b_mul(t, a.c1, a.c2);
  b_mul_nu(t, t);
  b_sub(t0, t0, t);
  b_mul(t1, a.c2, a.c2);
  b_mul_nu(t1, t1);
  b_mul(t, a.c0, a.c1);
  b_sub(t1, t1, t);
  b_mul(t2, a.c1, a.c1);
  b_mul(t, a.c0, a.c2);
  b_sub(t2, t2, t);
  Bq n1, n2;
  b_mul(n, a.c0, t0);
  b_mul(n1, a.c2, t1);
  b_mul_nu(n1, n1);
  b_add(n, n, n1);
  b_mul(n2, a.c1, t2);
  b_mul_nu(n2, n2);
  b_add(n, n, n2);
  b_inv(ni, n);
  b_mul(o.c0, t0, ni);
  b_mul(o.c1, t1, ni);
  b_mul(o.c2, t2, ni);
}

static inline void b3_mul_v(Bq3 &o, const Bq3 &a) {
  Bq t;
  b_mul_nu(t, a.c2);
  Bq n1 = a.c0, n2 = a.c1;
  o.c0 = t;
  o.c1 = n1;
  o.c2 = n2;
}

static inline void b6_set1(Bq6 &o) { b3_set1(o.c0); b3_set0(o.c1); }
static inline void b6_conj(Bq6 &o, const Bq6 &a) { o.c0 = a.c0; b3_neg(o.c1, a.c1); }

static void b6_mul(Bq6 &o, const Bq6 &a, const Bq6 &b) {
  Bq3 v0, v1, sa, sb, t, vv;
  b3_mul(v0, a.c0, b.c0);
  b3_mul(v1, a.c1, b.c1);
  b3_add(sa, a.c0, a.c1);
  b3_add(sb, b.c0, b.c1);
  b3_mul(t, sa, sb);
  b3_sub(t, t, v0);
  b3_sub(t, t, v1);
  b3_mul_v(vv, v1);
  b3_add(o.c0, v0, vv);
  o.c1 = t;
}

static void b6_sqr(Bq6 &o, const Bq6 &a) { b6_mul(o, a, a); }

static void b6_inv(Bq6 &o, const Bq6 &a) {
  Bq3 s0, s1, n, ni, t;
  b3_mul(s0, a.c0, a.c0);
  b3_mul(s1, a.c1, a.c1);
  b3_mul_v(t, s1);
  b3_sub(n, s0, t);
  b3_inv(ni, n);
  b3_mul(o.c0, a.c0, ni);
  b3_mul(t, a.c1, ni);
  b3_neg(o.c1, t);
}

static void b6_frob(Bq6 &o, const Bq6 &a) {
  // (c w^k)^q = c * gamma_k w^k, c in Fq (bw6_761.py:172-182)
  const Bq *A[3] = {&a.c0.c0, &a.c0.c1, &a.c0.c2};
  const Bq *B[3] = {&a.c1.c0, &a.c1.c1, &a.c1.c2};
  Bq *OA[3] = {&o.c0.c0, &o.c0.c1, &o.c0.c2};
  Bq *OB[3] = {&o.c1.c0, &o.c1.c1, &o.c1.c2};
  for (int i = 0; i < 3; ++i) {
    b_mul(*OA[i], *A[i], BW6_GAMMA[2 * i]);
    b_mul(*OB[i], *B[i], BW6_GAMMA[2 * i + 1]);
  }
}

// ---------------------------------------------------------------------------
// BW6-761 Tate Miller loop (mirrors bw6_761.py:130-169), lockstep over all
// pairs with shared batched Fq inversions — the loop bits (of r) are common
// to every pair, so all pairs double/add on the same iterations.
// ---------------------------------------------------------------------------

struct BAff { Bq x, y; bool inf; };

static void b_batch_inv(Bq *out, const Bq *in, int k) {
  Bq pref[ZKP_MAXK + 1];
  b_set1(pref[0]);
  for (int i = 0; i < k; ++i) b_mul(pref[i + 1], pref[i], in[i]);
  Bq inv_all;
  b_inv(inv_all, pref[k]);
  for (int i = k - 1; i >= 0; --i) {
    b_mul(out[i], pref[i], inv_all);
    Bq t;
    b_mul(t, inv_all, in[i]);
    inv_all = t;
  }
}

// line through G1 points T, S at psi(Q2) = (xQ w^2, yQ w^3), slope given;
// l = (lam xT - yT) + (-lam xQ) w^2 + yQ w^3
static void bw6_line_lam(Bq6 &line, BAff &Tout, const BAff &T, const BAff &S,
                         const Bq &xQ, const Bq &yQ, const Bq &lam) {
  Bq l2, x3, y3, t;
  b_mul(l2, lam, lam);
  b_sub(x3, l2, T.x);
  b_sub(x3, x3, S.x);
  b_sub(t, T.x, x3);
  b_mul(y3, lam, t);
  b_sub(y3, y3, T.y);
  Tout.x = x3;
  Tout.y = y3;
  Tout.inf = false;
  Bq c0, c1;
  b_mul(c0, lam, T.x);
  b_sub(c0, c0, T.y);
  b_mul(c1, lam, xQ);
  b_neg(c1, c1);
  b3_set0(line.c0);
  b3_set0(line.c1);
  line.c0.c0 = c0;
  line.c0.c1 = c1;
  line.c1.c1 = yQ;
}

static void bw6_miller_multi(Bq6 &fout, int k, const BAff *P, const Bq *xQ,
                             const Bq *yQ) {
  Bq6 f[ZKP_MAXK];
  BAff T[ZKP_MAXK];
  for (int i = 0; i < k; ++i) {
    b6_set1(f[i]);
    T[i] = P[i];
  }
  Bq den[ZKP_MAXK], dinv[ZKP_MAXK], lam;
  // skip[i]: this pair's step is a special case handled without the slope
  bool skip[ZKP_MAXK];
  Bq6 sline[ZKP_MAXK];
  for (int bit = 1; bit < BW6_RBITS_N; ++bit) {  // MSB-first, leading 1 done
    // ---- double step: lam = 3 x^2 / 2y ---------------------------------
    for (int i = 0; i < k; ++i) {
      skip[i] = T[i].inf;
      if (skip[i]) {
        b6_set1(sline[i]);
        b_set1(den[i]);  // keep the batch product nonzero
      } else {
        b_add(den[i], T[i].y, T[i].y);
      }
    }
    b_batch_inv(dinv, den, k);
    for (int i = 0; i < k; ++i) {
      Bq6 t;
      b6_sqr(t, f[i]);
      if (skip[i]) {
        b6_mul(f[i], t, sline[i]);
        continue;
      }
      Bq x2, num;
      b_mul(x2, T[i].x, T[i].x);
      b_add(num, x2, x2);
      b_add(num, num, x2);
      b_mul(lam, num, dinv[i]);
      Bq6 line;
      BAff T2;
      bw6_line_lam(line, T2, T[i], T[i], xQ[i], yQ[i], lam);
      T[i] = T2;
      b6_mul(f[i], t, line);
    }
    if (!BW6_RBITS[bit]) continue;
    // ---- add step: T + P (vertical when T = -P: final loop iteration) --
    for (int i = 0; i < k; ++i) {
      skip[i] = false;
      if (T[i].inf) {
        skip[i] = true;
        b6_set1(sline[i]);
        b_set1(den[i]);
        continue;
      }
      if (cmp_n<12>(T[i].x.l, P[i].x.l) == 0) {
        Bq sy;
        b_add(sy, T[i].y, P[i].y);
        if (b_is0(sy)) {
          // vertical line: l = xQ w^2 - x_T; T' = infinity (bw6_761.py:146-147)
          skip[i] = true;
          Bq nx;
          b_neg(nx, T[i].x);
          b3_set0(sline[i].c0);
          b3_set0(sline[i].c1);
          sline[i].c0.c0 = nx;
          sline[i].c0.c1 = xQ[i];
          T[i].inf = true;
          b_set1(den[i]);
          continue;
        }
        // T == P: doubling slope
        b_add(den[i], T[i].y, T[i].y);
        continue;
      }
      b_sub(den[i], P[i].x, T[i].x);
    }
    b_batch_inv(dinv, den, k);
    for (int i = 0; i < k; ++i) {
      if (skip[i]) {
        Bq6 t;
        b6_mul(t, f[i], sline[i]);
        f[i] = t;
        continue;
      }
      Bq num;
      bool dble = cmp_n<12>(T[i].x.l, P[i].x.l) == 0;
      if (dble) {
        Bq x2;
        b_mul(x2, T[i].x, T[i].x);
        b_add(num, x2, x2);
        b_add(num, num, x2);
      } else {
        b_sub(num, P[i].y, T[i].y);
      }
      b_mul(lam, num, dinv[i]);
      Bq6 line, t;
      BAff T2;
      bw6_line_lam(line, T2, T[i], P[i], xQ[i], yQ[i], lam);
      T[i] = T2;
      b6_mul(t, f[i], line);
      f[i] = t;
    }
  }
  Bq6 acc = f[0];
  for (int i = 1; i < k; ++i) {
    Bq6 t;
    b6_mul(t, acc, f[i]);
    acc = t;
  }
  fout = acc;
}

// hard part via base-q multi-exp: e_hard = l0 + l1 q, f^q = Frobenius
static void bw6_hard_part(Bq6 &out, const Bq6 &e) {
  Bq6 g1e = e, gq, gboth;
  b6_frob(gq, e);
  b6_mul(gboth, g1e, gq);
  const Bq6 *table[4] = {nullptr, &g1e, &gq, &gboth};
  Bq6 acc;
  b6_set1(acc);
  for (int j = 0; j < BW6_ED_N; ++j) {
    Bq6 t;
    b6_sqr(t, acc);
    int idx = (int)BW6_ED[j] | ((int)BW6_ED[BW6_ED_N + j] << 1);
    if (idx) {
      b6_mul(acc, t, *table[idx]);
    } else {
      acc = t;
    }
  }
  out = acc;
}

static void bw6_final_exp(Bq6 &out, const Bq6 &f_in) {
  // easy: f^(q^3-1) = [three frobenii] * f^{-1}, then f^(q+1)
  Bq6 f3, fi, f2, fr, e;
  b6_frob(f3, f_in);
  Bq6 tmp;
  b6_frob(tmp, f3);
  b6_frob(f3, tmp);
  b6_inv(fi, f_in);
  b6_mul(f2, f3, fi);
  b6_frob(fr, f2);
  b6_mul(e, fr, f2);
  bw6_hard_part(out, e);
}

extern "C" int zkp_bw6_setup(const u64 *q_limbs, const u64 *nu_canon,
                             const uint8_t *r_bits, int n_rbits,
                             const uint8_t *e_digit_bits, int n_ebits,
                             const u64 *gammas_canon) {
  // e_digit_bits: 2 x n_ebits — base-q digits of the hard exponent
  ctx_init<12>(BW6, q_limbs);
  mont_mul_n<12>(BW6, BW6_NU.l, nu_canon, BW6.r2);
  if (BW6_RBITS) delete[] BW6_RBITS;
  BW6_RBITS = new uint8_t[n_rbits];
  memcpy(BW6_RBITS, r_bits, n_rbits);
  BW6_RBITS_N = n_rbits;
  if (BW6_ED) delete[] BW6_ED;
  BW6_ED = new uint8_t[2 * n_ebits];
  memcpy(BW6_ED, e_digit_bits, 2 * n_ebits);
  BW6_ED_N = n_ebits;
  for (int k = 0; k < 6; ++k) {
    mont_mul_n<12>(BW6, BW6_GAMMA[k].l, gammas_canon + k * 12, BW6.r2);
  }
  return 0;
}

extern "C" int zkp_bw6_multi_pairing(int k, const u64 *g1, const u64 *g2,
                                     u64 *out) {
  Bq6 acc;
  b6_set1(acc);
  for (int base = 0; base < k; base += ZKP_MAXK) {
    int kk = k - base;
    if (kk > ZKP_MAXK) kk = ZKP_MAXK;
    BAff P[ZKP_MAXK];
    Bq xQ[ZKP_MAXK], yQ[ZKP_MAXK];
    for (int j = 0; j < kk; ++j) {
      int i = base + j;
      mont_mul_n<12>(BW6, P[j].x.l, g1 + i * 24, BW6.r2);
      mont_mul_n<12>(BW6, P[j].y.l, g1 + i * 24 + 12, BW6.r2);
      P[j].inf = false;
      mont_mul_n<12>(BW6, xQ[j].l, g2 + i * 24, BW6.r2);
      mont_mul_n<12>(BW6, yQ[j].l, g2 + i * 24 + 12, BW6.r2);
    }
    Bq6 f, t;
    bw6_miller_multi(f, kk, P, xQ, yQ);
    b6_mul(t, acc, f);
    acc = t;
  }
  Bq6 r;
  bw6_final_exp(r, acc);
  const Bq *coords[6] = {&r.c0.c0, &r.c0.c1, &r.c0.c2,
                         &r.c1.c0, &r.c1.c1, &r.c1.c2};
  u64 onebuf[12] = {1};
  for (int i = 0; i < 6; ++i) {
    mont_mul_n<12>(BW6, out + i * 12, coords[i]->l, onebuf);
  }
  return 0;
}
