#include "ntt2x2.h"

namespace oracle {

namespace {

inline int32_t pmul(int32_t a, int32_t b) { return plain_mul(a, b); }
inline int32_t padd(int32_t a, int32_t b) { return plain_add(a, b); }
inline int32_t psub(int32_t a, int32_t b) { return plain_sub(a, b); }
inline int32_t pdiv2(int32_t a) { return plain_div2(a); }

// Natural-order plain zeta table (see `plain_zeta` in the header).
struct PlainZetas {
  int32_t z[kN];
  PlainZetas() {
    int32_t pw[kN];
    pw[0] = 1;
    for (int i = 1; i < kN; ++i) pw[i] = pmul(pw[i - 1], 1753);
    for (int i = 0; i < kN; ++i) {
      int r = 0;
      for (int b = 0; b < 8; ++b) r |= ((i >> b) & 1) << (7 - b);
      z[i] = pw[r];
    }
    z[0] = 0;
  }
};
const PlainZetas kPlain;

inline void ctbf(int32_t* a, int32_t* b, int32_t zeta) {
  int32_t t = pmul(*b, zeta);
  *b = psub(*a, t);
  *a = padd(*a, t);
}

// GS butterfly with the divide-by-2 folded into both outputs. div2 commutes
// with the zeta multiply, so folding before it (as the RTL's output stage
// does) equals folding after.
inline void gsbf2(int32_t* a, int32_t* b, int32_t neg_zeta) {
  int32_t t = pdiv2(psub(*a, *b));
  *a = pdiv2(padd(*a, *b));
  *b = pmul(t, neg_zeta);
}

}  // namespace

int32_t plain_zeta(int k) { return kPlain.z[k]; }

void ntt2x2(Poly a) {
  // Four passes, two CT levels fused per pass (`ref_ntt2x2.cpp:37-82`):
  // within a 4-way group {x0, x1, x2, x3} at stride `quarter`, level 1
  // pairs (x0,x2)/(x1,x3) under the parent zeta and level 2 pairs
  // (x0,x1)/(x2,x3) under the two child zetas 2k and 2k+1.
  for (int block = kN; block >= 4; block >>= 2) {
    int quarter = block >> 2;
    for (int base = 0; base < kN; base += block) {
      int k1 = (kN + base) / block;
      int32_t z1 = kPlain.z[k1];
      int32_t z20 = kPlain.z[2 * k1];
      int32_t z21 = kPlain.z[2 * k1 + 1];
      for (int j = base; j < base + quarter; ++j) {
        int32_t* x0 = &a[j];
        int32_t* x1 = &a[j + quarter];
        int32_t* x2 = &a[j + 2 * quarter];
        int32_t* x3 = &a[j + 3 * quarter];
        ctbf(x0, x2, z1);
        ctbf(x1, x3, z1);
        ctbf(x0, x1, z20);
        ctbf(x2, x3, z21);
      }
    }
  }
}

void invntt2x2(Poly a) {
  // Mirror image (`ref_ntt2x2.cpp:100-145`): two GS levels per pass,
  // negated zetas in descending index order, 1/256 folded as one div2 per
  // level (8 levels = the full scale, so no final multiply).
  for (int quarter = 1; quarter <= kN / 4; quarter <<= 2) {
    int block = quarter << 2;
    for (int base = 0; base < kN; base += block) {
      int k1 = (kN - base / 2) / quarter - 1;
      int k2 = (kN - base / 2) / (2 * quarter) - 1;
      int32_t z10 = psub(0, kPlain.z[k1]);
      int32_t z11 = psub(0, kPlain.z[k1 - 1]);
      int32_t z2 = psub(0, kPlain.z[k2]);
      for (int j = base; j < base + quarter; ++j) {
        int32_t* x0 = &a[j];
        int32_t* x1 = &a[j + quarter];
        int32_t* x2 = &a[j + 2 * quarter];
        int32_t* x3 = &a[j + 3 * quarter];
        gsbf2(x0, x1, z10);
        gsbf2(x2, x3, z11);
        gsbf2(x0, x2, z2);
        gsbf2(x1, x3, z2);
      }
    }
  }
}

// ---- line-layout model ----

unsigned resolve_address(Mapping mapping, unsigned addr) {
  switch (mapping) {
    case Mapping::kAfterNtt:
      return (addr % 4) * (kN / 16) + addr / 4;
    case Mapping::kAfterInvntt:
      return (addr % (kN / 16)) * 4 + addr / (kN / 16);
    case Mapping::kNatural:
    default:
      return addr;
  }
}

void reshape(LineRam* ram, const Poly in) {
  for (int i = 0; i < kN / 4; ++i)
    for (int s = 0; s < 4; ++s) ram->lines[i][s] = in[4 * i + s];
}

void extract(const LineRam& ram, Mapping mapping, Poly out) {
  for (int i = 0; i < kN / 4; ++i) {
    const int32_t* line = ram.lines[resolve_address(mapping, i)];
    for (int s = 0; s < 4; ++s) out[4 * i + s] = line[s];
  }
}

namespace {

// Each op rotates the logical->physical line-address map further: the
// forward NTT by 2 address bits (NATURAL becomes AFTER_NTT), the inverse by
// 4 (AFTER_NTT becomes NATURAL: rol2 . rol4 = rol6 = identity on 6 bits).
Mapping rotate(Mapping in, int step) {
  static const Mapping order[3] = {
      Mapping::kNatural, Mapping::kAfterNtt, Mapping::kAfterInvntt};
  int idx = in == Mapping::kNatural ? 0 : in == Mapping::kAfterNtt ? 1 : 2;
  return order[(idx + step) % 3];
}

void scatter(LineRam* ram, Mapping mapping, const Poly in) {
  for (int i = 0; i < kN / 4; ++i) {
    int32_t* line = ram->lines[resolve_address(mapping, i)];
    for (int s = 0; s < 4; ++s) line[s] = in[4 * i + s];
  }
}

}  // namespace

Mapping after_fwdntt(Mapping in) { return rotate(in, 1); }
Mapping after_invntt(Mapping in) { return rotate(in, 2); }

void lineram_fwdntt(LineRam* ram, Mapping mapping) {
  Poly a;
  extract(*ram, mapping, a);
  ntt2x2(a);
  scatter(ram, after_fwdntt(mapping), a);
}

void lineram_invntt(LineRam* ram, Mapping mapping) {
  Poly a;
  extract(*ram, mapping, a);
  invntt2x2(a);
  scatter(ram, after_invntt(mapping), a);
}

void lineram_mul(LineRam* ram, const LineRam& other, Mapping mapping) {
  // Slotwise plain product; `mapping` relates ram's layout to other's
  // (NATURAL when both sit under the same permutation, as after two
  // forward NTTs — `ntt2x2_test.cpp` polymul chain).
  for (int i = 0; i < kN / 4; ++i) {
    int32_t* line = ram->lines[resolve_address(mapping, i)];
    const int32_t* w = other.lines[i];
    for (int s = 0; s < 4; ++s) line[s] = pmul(line[s], w[s]);
  }
}

}  // namespace oracle
