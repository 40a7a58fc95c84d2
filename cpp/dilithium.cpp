#include "dilithium.h"

#include <cstring>

#include "keccak.h"

namespace oracle {

namespace {

// ---------- modular arithmetic (Montgomery, R = 2^32) ----------

constexpr uint32_t kQInv = 58728449u;  // q^-1 mod 2^32
constexpr uint32_t kMontR2 = 2365951u;  // (2^32)^2 mod q

// a*b*R^-1 mod q, inputs canonical [0, q). Result canonical.
inline uint32_t mont_mul(uint32_t a, uint32_t b) {
  uint64_t prod = uint64_t(a) * b;
  uint32_t m = uint32_t(prod) * uint32_t(-int32_t(kQInv));  // (-p q^-1) mod 2^32
  uint64_t t = prod + uint64_t(m) * uint32_t(kQ);
  uint32_t r = uint32_t(t >> 32);
  return r >= uint32_t(kQ) ? r - kQ : r;
}

inline uint32_t add_mod(uint32_t a, uint32_t b) {
  uint32_t t = a + b;
  return t >= uint32_t(kQ) ? t - kQ : t;
}

inline uint32_t sub_mod(uint32_t a, uint32_t b) {
  uint32_t t = a + kQ - b;
  return t >= uint32_t(kQ) ? t - kQ : t;
}

inline uint32_t mul_mod(uint32_t a, uint32_t b) {  // plain a*b mod q
  return mont_mul(mont_mul(a, kMontR2), b);
}

inline int32_t center(uint32_t a) {  // [0,q) -> (-q/2, q/2]
  return int32_t(a) - ((int32_t(a) > (kQ - 1) / 2) ? kQ : 0);
}

inline uint32_t uncenter(int32_t a) {  // (-q, q) -> [0, q)
  return uint32_t(a < 0 ? a + kQ : a);
}

// ---------- zeta tables (built once, from the primitive root) ----------

struct Zetas {
  uint32_t fwd[256];  // zeta^bitrev8(i) in Montgomery form
  Zetas() {
    auto bitrev8 = [](int x) {
      int r = 0;
      for (int b = 0; b < 8; ++b) r |= ((x >> b) & 1) << (7 - b);
      return r;
    };
    uint32_t pow_[256];
    pow_[0] = 1;
    for (int i = 1; i < 256; ++i) pow_[i] = mul_mod(pow_[i - 1], 1753u);
    for (int i = 0; i < 256; ++i)
      fwd[i] = mont_mul(pow_[bitrev8(i)], kMontR2);  // lift to Montgomery
  }
};
const Zetas kZetas;

}  // namespace

// ---------- NTT (CT forward / GS inverse, canonical coefficients) ----------

void ntt(Poly a) {
  int k = 0;
  for (int len = 128; len >= 1; len >>= 1) {
    for (int start = 0; start < kN; start += 2 * len) {
      uint32_t zeta = kZetas.fwd[++k];
      for (int j = start; j < start + len; ++j) {
        uint32_t t = mont_mul(zeta, uint32_t(a[j + len]));
        a[j + len] = int32_t(sub_mod(uint32_t(a[j]), t));
        a[j] = int32_t(add_mod(uint32_t(a[j]), t));
      }
    }
  }
}

void invntt(Poly a) {
  int k = 256;
  for (int len = 1; len <= 128; len <<= 1) {
    for (int start = 0; start < kN; start += 2 * len) {
      uint32_t zeta = sub_mod(0, kZetas.fwd[--k]);  // -zeta
      for (int j = start; j < start + len; ++j) {
        uint32_t t = uint32_t(a[j]);
        a[j] = int32_t(add_mod(t, uint32_t(a[j + len])));
        a[j + len] = int32_t(mont_mul(zeta, sub_mod(t, uint32_t(a[j + len]))));
      }
    }
  }
  // fold in 256^-1; inputs came through mont_mul chains carrying R^-1 per
  // stage pair exactly as the JAX path (ops/ntt.py _F_PLAIN)
  const uint32_t f = uint32_t((uint64_t(8347681) << 32) % kQ);  // 256^-1 * R
  for (int j = 0; j < kN; ++j)
    a[j] = int32_t(mont_mul(uint32_t(a[j]), f));
}

void pointwise(Poly c, const Poly a, const Poly b) {
  for (int j = 0; j < kN; ++j)
    c[j] = int32_t(mont_mul(uint32_t(a[j]), uint32_t(b[j])));
}

namespace {

// invntt for products that carry R^-1: fold 256^-1 * R^2 instead
void invntt_from_product(Poly a) {
  int k = 256;
  for (int len = 1; len <= 128; len <<= 1) {
    for (int start = 0; start < kN; start += 2 * len) {
      uint32_t zeta = sub_mod(0, kZetas.fwd[--k]);
      for (int j = start; j < start + len; ++j) {
        uint32_t t = uint32_t(a[j]);
        a[j] = int32_t(add_mod(t, uint32_t(a[j + len])));
        a[j + len] = int32_t(mont_mul(zeta, sub_mod(t, uint32_t(a[j + len]))));
      }
    }
  }
  // fold 256^-1 * R^2: mont_mul(x, f) = x * 256^-1 * R, cancelling the
  // R^-1 the pointwise products carry (ops/ntt.py _F_PRODUCT)
  const uint32_t f = mul_mod(8347681u, kMontR2);
  for (int j = 0; j < kN; ++j)
    a[j] = int32_t(mont_mul(uint32_t(a[j]), f));
}

// ---------- rounding ----------

inline void power2round(int32_t a, int32_t* a1, int32_t* a0) {
  *a1 = (a + (1 << (kD - 1)) - 1) >> kD;
  *a0 = a - (*a1 << kD);
}

inline void decompose(const Params& p, int32_t a, int32_t* a1, int32_t* a0) {
  int32_t t = (a + 127) >> 7;
  if (p.gamma2 == (kQ - 1) / 32) {
    t = (t * 1025 + (1 << 21)) >> 22;
    t &= 15;
  } else {
    t = (t * 11275 + (1 << 23)) >> 24;
    t ^= ((43 - t) >> 31) & t;
  }
  *a1 = t;
  *a0 = a - t * 2 * p.gamma2;
  *a0 -= (((kQ - 1) / 2 - *a0) >> 31) & kQ;
}

inline int make_hint(const Params& p, int32_t a0, int32_t a1) {
  return (a0 > p.gamma2 || a0 < -p.gamma2 || (a0 == -p.gamma2 && a1 != 0)) ? 1 : 0;
}

inline int32_t use_hint(const Params& p, int hint, int32_t a) {
  int32_t a1, a0;
  decompose(p, a, &a1, &a0);
  if (!hint) return a1;
  if (p.gamma2 == (kQ - 1) / 32)
    return a0 > 0 ? (a1 + 1) & 15 : (a1 - 1) & 15;
  return a0 > 0 ? (a1 == 43 ? 0 : a1 + 1) : (a1 == 0 ? 43 : a1 - 1);
}

bool norm_exceeds(const Poly a, int32_t bound) {  // canonical input
  for (int j = 0; j < kN; ++j) {
    int32_t c = center(uint32_t(a[j]));
    if (c < 0) c = -c;
    if (c >= bound) return true;
  }
  return false;
}

// ---------- bit packing ----------

void pack_bits(uint8_t* out, const uint32_t* vals, int n, int bits) {
  std::memset(out, 0, size_t(n) * bits / 8);
  int bit = 0;
  for (int i = 0; i < n; ++i) {
    for (int b = 0; b < bits; ++b, ++bit)
      out[bit / 8] |= uint8_t(((vals[i] >> b) & 1u) << (bit % 8));
  }
}

void unpack_bits(uint32_t* vals, const uint8_t* in, int n, int bits) {
  int bit = 0;
  for (int i = 0; i < n; ++i) {
    uint32_t v = 0;
    for (int b = 0; b < bits; ++b, ++bit)
      v |= uint32_t((in[bit / 8] >> (bit % 8)) & 1u) << b;
    vals[i] = v;
  }
}

// ---------- samplers ----------

void expand_a_poly(Poly out, const uint8_t rho[kSeedBytes], int i, int j) {
  uint8_t msg[kSeedBytes + 2];
  std::memcpy(msg, rho, kSeedBytes);
  uint16_t nonce = uint16_t((i << 8) + j);
  msg[kSeedBytes] = uint8_t(nonce & 0xFF);
  msg[kSeedBytes + 1] = uint8_t(nonce >> 8);
  KeccakState st(168);
  st.absorb(msg, sizeof msg);
  st.finalize();
  int n = 0;
  uint8_t buf[168];
  while (n < kN) {
    st.squeeze(buf, sizeof buf);
    for (int k = 0; k + 3 <= int(sizeof buf) && n < kN; k += 3) {
      uint32_t v = uint32_t(buf[k]) | uint32_t(buf[k + 1]) << 8 |
                   (uint32_t(buf[k + 2]) & 0x7F) << 16;
      if (v < uint32_t(kQ)) out[n++] = int32_t(v);
    }
  }
}

void expand_s_poly(const Params& p, Poly out, const uint8_t sigma[kCrhBytes],
                   uint16_t nonce) {
  uint8_t msg[kCrhBytes + 2];
  std::memcpy(msg, sigma, kCrhBytes);
  msg[kCrhBytes] = uint8_t(nonce & 0xFF);
  msg[kCrhBytes + 1] = uint8_t(nonce >> 8);
  KeccakState st(136);
  st.absorb(msg, sizeof msg);
  st.finalize();
  int n = 0;
  uint8_t buf[136];
  while (n < kN) {
    st.squeeze(buf, sizeof buf);
    for (int k = 0; k < int(sizeof buf) && n < kN; ++k) {
      for (int nib = 0; nib < 2 && n < kN; ++nib) {
        uint32_t t = nib ? (buf[k] >> 4) : (buf[k] & 0xF);
        if (p.eta == 2) {
          if (t < 15) out[n++] = int32_t(uncenter(2 - int32_t(t % 5)));
        } else {
          if (t < 9) out[n++] = int32_t(uncenter(4 - int32_t(t)));
        }
      }
    }
  }
}

void expand_mask_poly(const Params& p, Poly out, const uint8_t rhop[kCrhBytes],
                      uint16_t nonce) {
  uint8_t msg[kCrhBytes + 2];
  std::memcpy(msg, rhop, kCrhBytes);
  msg[kCrhBytes] = uint8_t(nonce & 0xFF);
  msg[kCrhBytes + 1] = uint8_t(nonce >> 8);
  uint8_t buf[5 * 136];
  shake256(buf, size_t(p.polyz_bytes), msg, sizeof msg);
  uint32_t vals[kN];
  unpack_bits(vals, buf, kN, p.gamma1_bits);
  for (int j = 0; j < kN; ++j)
    out[j] = int32_t(uncenter(p.gamma1 - int32_t(vals[j])));
}

void sample_in_ball(const Params& p, Poly c, const uint8_t c_tilde[kSeedBytes]) {
  KeccakState st(136);
  st.absorb(c_tilde, kSeedBytes);
  st.finalize();
  uint8_t signs[8];
  st.squeeze(signs, 8);
  uint64_t sbits = 0;
  for (int k = 0; k < 8; ++k) sbits |= uint64_t(signs[k]) << (8 * k);
  std::memset(c, 0, sizeof(Poly));
  for (int i = kN - p.tau; i < kN; ++i) {
    uint8_t j;
    do st.squeeze(&j, 1);
    while (j > i);
    c[i] = c[j];
    c[j] = (sbits & 1) ? kQ - 1 : 1;
    sbits >>= 1;
  }
}

// ---------- codecs ----------

void pack_eta(const Params& p, uint8_t* out, const Poly s) {
  uint32_t vals[kN];
  for (int j = 0; j < kN; ++j)
    vals[j] = uint32_t(p.eta - center(uint32_t(s[j])));
  pack_bits(out, vals, kN, p.eta_bits);
}

void unpack_eta(const Params& p, Poly s, const uint8_t* in) {
  uint32_t vals[kN];
  unpack_bits(vals, in, kN, p.eta_bits);
  for (int j = 0; j < kN; ++j)
    s[j] = int32_t(uncenter(p.eta - int32_t(vals[j])));
}

void pack_t1(uint8_t* out, const Poly t1) {
  uint32_t vals[kN];
  for (int j = 0; j < kN; ++j) vals[j] = uint32_t(t1[j]);
  pack_bits(out, vals, kN, 10);
}

void unpack_t1(Poly t1, const uint8_t* in) {
  uint32_t vals[kN];
  unpack_bits(vals, in, kN, 10);
  for (int j = 0; j < kN; ++j) t1[j] = int32_t(vals[j]);
}

void pack_t0(uint8_t* out, const Poly t0) {  // t0 centered
  uint32_t vals[kN];
  for (int j = 0; j < kN; ++j)
    vals[j] = uint32_t((1 << (kD - 1)) - t0[j]);
  pack_bits(out, vals, kN, 13);
}

void unpack_t0(Poly t0, const uint8_t* in) {
  uint32_t vals[kN];
  unpack_bits(vals, in, kN, 13);
  for (int j = 0; j < kN; ++j) t0[j] = (1 << (kD - 1)) - int32_t(vals[j]);
}

void pack_z(const Params& p, uint8_t* out, const Poly z) {  // z canonical
  uint32_t vals[kN];
  for (int j = 0; j < kN; ++j)
    vals[j] = uint32_t(p.gamma1 - center(uint32_t(z[j])));
  pack_bits(out, vals, kN, p.gamma1_bits);
}

void unpack_z(const Params& p, Poly z, const uint8_t* in) {
  uint32_t vals[kN];
  unpack_bits(vals, in, kN, p.gamma1_bits);
  for (int j = 0; j < kN; ++j)
    z[j] = int32_t(uncenter(p.gamma1 - int32_t(vals[j])));
}

void pack_w1(const Params& p, uint8_t* out, const Poly w1) {
  uint32_t vals[kN];
  for (int j = 0; j < kN; ++j) vals[j] = uint32_t(w1[j]);
  pack_bits(out, vals, kN, p.w1_bits);
}

// hint codec: positions then cumulative counts (round-3 signature format)
void pack_hints(const Params& p, uint8_t* out, const int32_t* h /*K*N*/) {
  std::memset(out, 0, size_t(p.omega + p.K));
  int n = 0;
  for (int k = 0; k < p.K; ++k) {
    for (int j = 0; j < kN; ++j)
      if (h[k * kN + j]) out[n++] = uint8_t(j);
    out[p.omega + k] = uint8_t(n);
  }
}

bool unpack_hints(const Params& p, int32_t* h /*K*N*/, const uint8_t* in) {
  std::memset(h, 0, sizeof(int32_t) * size_t(p.K) * kN);
  int prev = 0;
  for (int k = 0; k < p.K; ++k) {
    int end = in[p.omega + k];
    if (end < prev || end > p.omega) return false;
    for (int j = prev; j < end; ++j) {
      if (j > prev && in[j] <= in[j - 1]) return false;  // strictly increasing
      h[k * kN + in[j]] = 1;
    }
    prev = end;
  }
  for (int j = prev; j < p.omega; ++j)
    if (in[j] != 0) return false;  // canonical zero padding
  return true;
}

// ---------- matrix/vector helpers ----------

struct Mat {
  int32_t a[8 * 7][kN];  // K*L max
};

void expand_a(const Params& p, Mat& m, const uint8_t rho[kSeedBytes]) {
  for (int i = 0; i < p.K; ++i)
    for (int j = 0; j < p.L; ++j)
      expand_a_poly(m.a[i * p.L + j], rho, i, j);
}

// w[k] = sum_l A[k,l] o v[l], carrying R^-1; then invntt_from_product
void matvec_invntt(const Params& p, const Mat& m, const int32_t v[][kN],
                   int32_t w[][kN]) {
  for (int k = 0; k < p.K; ++k) {
    Poly acc;
    std::memset(acc, 0, sizeof acc);
    for (int l = 0; l < p.L; ++l) {
      Poly t;
      pointwise(t, m.a[k * p.L + l], v[l]);
      for (int j = 0; j < kN; ++j)
        acc[j] = int32_t(add_mod(uint32_t(acc[j]), uint32_t(t[j])));
    }
    std::memcpy(w[k], acc, sizeof acc);
    invntt_from_product(w[k]);
  }
}

}  // namespace

// ---------- params ----------

const Params& params(int level) {
  static const Params p2 = [] {
    Params p{};
    p.level = 2; p.K = 4; p.L = 4; p.eta = 2; p.tau = 39; p.beta = 78;
    p.omega = 80; p.gamma1 = 1 << 17; p.gamma2 = (kQ - 1) / 88;
    p.gamma1_bits = 18; p.eta_bits = 3; p.w1_bits = 6;
    p.polyz_bytes = 576; p.polyeta_bytes = 96; p.polyw1_bytes = 192;
    p.pk_bytes = kSeedBytes + p.K * 320;
    p.sk_bytes = 2 * kSeedBytes + kTrBytes + (p.K + p.L) * p.polyeta_bytes + p.K * 416;
    p.sig_bytes = kSeedBytes + p.L * p.polyz_bytes + p.omega + p.K;
    return p;
  }();
  static const Params p3 = [] {
    Params p{};
    p.level = 3; p.K = 6; p.L = 5; p.eta = 4; p.tau = 49; p.beta = 196;
    p.omega = 55; p.gamma1 = 1 << 19; p.gamma2 = (kQ - 1) / 32;
    p.gamma1_bits = 20; p.eta_bits = 4; p.w1_bits = 4;
    p.polyz_bytes = 640; p.polyeta_bytes = 128; p.polyw1_bytes = 128;
    p.pk_bytes = kSeedBytes + p.K * 320;
    p.sk_bytes = 2 * kSeedBytes + kTrBytes + (p.K + p.L) * p.polyeta_bytes + p.K * 416;
    p.sig_bytes = kSeedBytes + p.L * p.polyz_bytes + p.omega + p.K;
    return p;
  }();
  static const Params p5 = [] {
    Params p{};
    p.level = 5; p.K = 8; p.L = 7; p.eta = 2; p.tau = 60; p.beta = 120;
    p.omega = 75; p.gamma1 = 1 << 19; p.gamma2 = (kQ - 1) / 32;
    p.gamma1_bits = 20; p.eta_bits = 3; p.w1_bits = 4;
    p.polyz_bytes = 640; p.polyeta_bytes = 96; p.polyw1_bytes = 128;
    p.pk_bytes = kSeedBytes + p.K * 320;
    p.sk_bytes = 2 * kSeedBytes + kTrBytes + (p.K + p.L) * p.polyeta_bytes + p.K * 416;
    p.sig_bytes = kSeedBytes + p.L * p.polyz_bytes + p.omega + p.K;
    return p;
  }();
  switch (level) {
    case 2: return p2;
    case 3: return p3;
    default: return p5;
  }
}

// ---------- scheme ----------

void keygen(int level, const uint8_t seed[kSeedBytes], uint8_t* pk, uint8_t* sk) {
  const Params& p = params(level);
  uint8_t seedbuf[2 * kSeedBytes + kCrhBytes];
  shake256(seedbuf, sizeof seedbuf, seed, kSeedBytes);
  const uint8_t* rho = seedbuf;
  const uint8_t* sigma = seedbuf + kSeedBytes;
  const uint8_t* key = seedbuf + kSeedBytes + kCrhBytes;

  Mat A;
  expand_a(p, A, rho);

  int32_t s1[7][kN], s2[8][kN], s1hat[7][kN], t[8][kN];
  for (int l = 0; l < p.L; ++l) expand_s_poly(p, s1[l], sigma, uint16_t(l));
  for (int k = 0; k < p.K; ++k) expand_s_poly(p, s2[k], sigma, uint16_t(p.L + k));

  for (int l = 0; l < p.L; ++l) {
    std::memcpy(s1hat[l], s1[l], sizeof(Poly));
    ntt(s1hat[l]);
  }
  matvec_invntt(p, A, s1hat, t);
  for (int k = 0; k < p.K; ++k)
    for (int j = 0; j < kN; ++j)
      t[k][j] = int32_t(add_mod(uint32_t(t[k][j]), uint32_t(s2[k][j])));

  // pk = rho || t1;  sk = rho || key || tr || s1 || s2 || t0
  std::memcpy(pk, rho, kSeedBytes);
  int32_t t0[8][kN];
  for (int k = 0; k < p.K; ++k) {
    Poly t1;
    for (int j = 0; j < kN; ++j) power2round(t[k][j], &t1[j], &t0[k][j]);
    pack_t1(pk + kSeedBytes + k * 320, t1);
  }
  uint8_t tr[kTrBytes];
  shake256(tr, kTrBytes, pk, size_t(p.pk_bytes));

  uint8_t* s = sk;
  std::memcpy(s, rho, kSeedBytes); s += kSeedBytes;
  std::memcpy(s, key, kSeedBytes); s += kSeedBytes;
  std::memcpy(s, tr, kTrBytes); s += kTrBytes;
  for (int l = 0; l < p.L; ++l) { pack_eta(p, s, s1[l]); s += p.polyeta_bytes; }
  for (int k = 0; k < p.K; ++k) { pack_eta(p, s, s2[k]); s += p.polyeta_bytes; }
  for (int k = 0; k < p.K; ++k) { pack_t0(s, t0[k]); s += 416; }
}

int sign(int level, const uint8_t* sk, const uint8_t mu[kCrhBytes], uint8_t* sig) {
  const Params& p = params(level);
  const uint8_t* rho = sk;
  const uint8_t* key = sk + kSeedBytes;
  const uint8_t* s1b = sk + 2 * kSeedBytes + kTrBytes;
  const uint8_t* s2b = s1b + p.L * p.polyeta_bytes;
  const uint8_t* t0b = s2b + p.K * p.polyeta_bytes;

  Mat A;
  expand_a(p, A, rho);
  int32_t s1hat[7][kN], s2hat[8][kN], t0hat[8][kN];
  for (int l = 0; l < p.L; ++l) {
    unpack_eta(p, s1hat[l], s1b + l * p.polyeta_bytes);
    ntt(s1hat[l]);
  }
  for (int k = 0; k < p.K; ++k) {
    unpack_eta(p, s2hat[k], s2b + k * p.polyeta_bytes);
    ntt(s2hat[k]);
    Poly t0;
    unpack_t0(t0, t0b + k * 416);
    for (int j = 0; j < kN; ++j) t0hat[k][j] = int32_t(uncenter(t0[j]));
    ntt(t0hat[k]);
  }

  uint8_t rhop[kCrhBytes];
  {
    uint8_t buf[kSeedBytes + kCrhBytes];
    std::memcpy(buf, key, kSeedBytes);
    std::memcpy(buf + kSeedBytes, mu, kCrhBytes);
    shake256(rhop, kCrhBytes, buf, sizeof buf);
  }

  for (uint16_t kappa = 0;; kappa = uint16_t(kappa + p.L)) {
    int attempt = kappa / p.L + 1;
    // y, w = INTT(A . NTT(y)), (w1, w0) = Decompose(w)
    int32_t y[7][kN], yhat[7][kN], w[8][kN], w1[8][kN], w0[8][kN];
    for (int l = 0; l < p.L; ++l) {
      expand_mask_poly(p, y[l], rhop, uint16_t(kappa + l));
      std::memcpy(yhat[l], y[l], sizeof(Poly));
      ntt(yhat[l]);
    }
    matvec_invntt(p, A, yhat, w);
    uint8_t w1packed[8 * 192];
    for (int k = 0; k < p.K; ++k) {
      for (int j = 0; j < kN; ++j) decompose(p, w[k][j], &w1[k][j], &w0[k][j]);
      pack_w1(p, w1packed + k * p.polyw1_bytes, w1[k]);
    }
    // c_tilde = H(mu || w1)
    uint8_t c_tilde[kSeedBytes];
    {
      KeccakState st(136);
      st.absorb(mu, kCrhBytes);
      st.absorb(w1packed, size_t(p.K) * p.polyw1_bytes);
      st.finalize();
      st.squeeze(c_tilde, kSeedBytes);
    }
    Poly c, chat;
    sample_in_ball(p, c, c_tilde);
    std::memcpy(chat, c, sizeof(Poly));
    ntt(chat);

    // z = y + INTT(c o s1hat)
    int32_t z[7][kN];
    bool reject = false;
    for (int l = 0; l < p.L && !reject; ++l) {
      Poly cs1;
      pointwise(cs1, chat, s1hat[l]);
      invntt_from_product(cs1);
      for (int j = 0; j < kN; ++j)
        z[l][j] = int32_t(add_mod(uint32_t(y[l][j]), uint32_t(cs1[j])));
      if (norm_exceeds(z[l], p.gamma1 - p.beta)) reject = true;
    }
    if (reject) continue;

    // w0 - cs2 check + hints from (w0 - cs2 + ct0, w1)
    int32_t h[8 * kN];
    int hints = 0;
    for (int k = 0; k < p.K && !reject; ++k) {
      Poly cs2, ct0;
      pointwise(cs2, chat, s2hat[k]);
      invntt_from_product(cs2);
      pointwise(ct0, chat, t0hat[k]);
      invntt_from_product(ct0);
      for (int j = 0; j < kN; ++j) {
        int32_t d = w0[k][j] - center(uint32_t(cs2[j]));
        int32_t ct0c = center(uint32_t(ct0[j]));
        if (d >= p.gamma2 - p.beta || d <= -(p.gamma2 - p.beta)) { reject = true; break; }
        if (ct0c >= p.gamma2 || ct0c <= -p.gamma2) { reject = true; break; }
        int hb = make_hint(p, d + ct0c, w1[k][j]);
        h[k * kN + j] = hb;
        hints += hb;
      }
    }
    if (reject || hints > p.omega) continue;

    std::memcpy(sig, c_tilde, kSeedBytes);
    for (int l = 0; l < p.L; ++l)
      pack_z(p, sig + kSeedBytes + l * p.polyz_bytes, z[l]);
    pack_hints(p, sig + kSeedBytes + p.L * p.polyz_bytes, h);
    return attempt;
  }
}

bool verify(int level, const uint8_t* pk, const uint8_t mu[kCrhBytes],
            const uint8_t* sig) {
  const Params& p = params(level);
  const uint8_t* rho = pk;
  const uint8_t* c_tilde = sig;
  const uint8_t* zb = sig + kSeedBytes;
  const uint8_t* hb = zb + p.L * p.polyz_bytes;

  int32_t h[8 * kN];
  if (!unpack_hints(p, h, hb)) return false;

  int32_t zhat[7][kN];
  for (int l = 0; l < p.L; ++l) {
    unpack_z(p, zhat[l], zb + l * p.polyz_bytes);
    if (norm_exceeds(zhat[l], p.gamma1 - p.beta)) return false;
    ntt(zhat[l]);
  }

  Mat A;
  expand_a(p, A, rho);
  Poly c, chat;
  sample_in_ball(p, c, c_tilde);
  std::memcpy(chat, c, sizeof(Poly));
  ntt(chat);

  uint8_t w1packed[8 * 192];
  for (int k = 0; k < p.K; ++k) {
    // w' = INTT(A_k . zhat - chat o NTT(t1 * 2^d))
    Poly acc;
    std::memset(acc, 0, sizeof acc);
    for (int l = 0; l < p.L; ++l) {
      Poly t;
      pointwise(t, A.a[k * p.L + l], zhat[l]);
      for (int j = 0; j < kN; ++j)
        acc[j] = int32_t(add_mod(uint32_t(acc[j]), uint32_t(t[j])));
    }
    Poly t1;
    unpack_t1(t1, pk + kSeedBytes + k * 320);
    for (int j = 0; j < kN; ++j) t1[j] <<= kD;  // still < q
    ntt(t1);
    Poly ct1;
    pointwise(ct1, chat, t1);
    for (int j = 0; j < kN; ++j)
      acc[j] = int32_t(sub_mod(uint32_t(acc[j]), uint32_t(ct1[j])));
    invntt_from_product(acc);
    Poly w1;
    for (int j = 0; j < kN; ++j)
      w1[j] = use_hint(p, int(h[k * kN + j]), acc[j]);
    pack_w1(p, w1packed + k * p.polyw1_bytes, w1);
  }

  uint8_t c_tilde2[kSeedBytes];
  {
    KeccakState st(136);
    st.absorb(mu, kCrhBytes);
    st.absorb(w1packed, size_t(p.K) * p.polyw1_bytes);
    st.finalize();
    st.squeeze(c_tilde2, kSeedBytes);
  }
  return std::memcmp(c_tilde, c_tilde2, kSeedBytes) == 0;
}

}  // namespace oracle
