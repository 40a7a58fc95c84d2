// Differential tests for the 2x2 NTT model — the reference's §4.3 strategy
// (`reference_code/ref_test_ntt_ntt2x2.cpp:44-93`, `hardware_code/
// ntt2x2_test.cpp:139-197`) replayed against this codebase:
//
//   1. plain zeta table == /root/reference/zetas.txt (when readable)
//   2. ntt2x2 == textbook ntt; invntt2x2 == textbook invntt; roundtrip
//   3. line-layout chains: fwd NATURAL->AFTER_NTT, inv NATURAL->
//      AFTER_INVNTT, slotwise mul, and the full polymul chain
//      fwd/fwd -> mul -> inv landing back on NATURAL
//   4. schoolbook negacyclic anchor for the polymul chain
//
// Usage: ntt2x2_test [iters] [zetas.txt]   (default 20000 iterations)

#include <cinttypes>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>

#include "dilithium.h"
#include "ntt2x2.h"

using oracle::kN;
using oracle::kQ;
using oracle::Poly;

static std::mt19937_64 rng(0x2f2f);

static void rand_poly(Poly a) {
  for (int i = 0; i < kN; ++i) a[i] = int32_t(rng() % kQ);
}

static int poly_eq(const Poly a, const Poly b, const char* what) {
  for (int i = 0; i < kN; ++i)
    if (a[i] != b[i]) {
      std::printf("MISMATCH %s at %d: %d vs %d\n", what, i, a[i], b[i]);
      return 1;
    }
  return 0;
}

static int check_zetas_file(const char* path) {
  std::FILE* f = std::fopen(path, "r");
  if (!f) {
    std::printf("zetas file %s not readable; skipping table check\n", path);
    return 0;
  }
  // regenerate the table exactly as ntt2x2.cpp does
  int64_t pw = 1;
  int64_t table[kN];
  int64_t powv[kN];
  for (int i = 0; i < kN; ++i) {
    powv[i] = pw;
    pw = pw * 1753 % kQ;
  }
  for (int i = 0; i < kN; ++i) {
    int r = 0;
    for (int b = 0; b < 8; ++b) r |= ((i >> b) & 1) << (7 - b);
    table[i] = powv[r];
  }
  table[0] = 0;
  int err = 0;
  char line[64];
  for (int i = 0; i < kN; ++i) {
    if (!std::fgets(line, sizeof line, f)) {
      std::printf("zetas file short at line %d\n", i);
      err = 1;
      break;
    }
    long v = std::strtol(line, nullptr, 16);
    if (v != table[i]) {
      std::printf("zeta[%d]: file %ld vs generated %" PRId64 "\n", i, v,
                  table[i]);
      err = 1;
    }
  }
  std::fclose(f);
  if (!err) std::printf("zeta table matches %s (256 entries)\n", path);
  return err;
}

// plain negacyclic schoolbook product, the mathematical ground truth
static void schoolbook(Poly c, const Poly a, const Poly b) {
  int64_t acc[kN] = {0};
  for (int i = 0; i < kN; ++i)
    for (int j = 0; j < kN; ++j) {
      int64_t t = int64_t(a[i]) * b[j] % kQ;
      int k = i + j;
      if (k >= kN) {
        k -= kN;
        t = (kQ - t) % kQ;
      }
      acc[k] = (acc[k] + t) % kQ;
    }
  for (int i = 0; i < kN; ++i) c[i] = int32_t(acc[i]);
}

static int one_iteration(bool with_schoolbook) {
  int err = 0;
  Poly a, b, ref;

  // forward: 2x2 == textbook
  rand_poly(a);
  std::memcpy(ref, a, sizeof(Poly));
  oracle::ntt2x2(a);
  oracle::ntt(ref);
  err |= poly_eq(a, ref, "ntt2x2 vs ntt");

  // inverse: 2x2 == textbook, and roundtrip
  rand_poly(a);
  std::memcpy(ref, a, sizeof(Poly));
  oracle::invntt2x2(a);
  oracle::invntt(ref);
  err |= poly_eq(a, ref, "invntt2x2 vs invntt");

  rand_poly(a);
  std::memcpy(ref, a, sizeof(Poly));
  oracle::ntt2x2(a);
  oracle::invntt2x2(a);
  err |= poly_eq(a, ref, "invntt2x2(ntt2x2) roundtrip");

  // line layout: forward from NATURAL reads back under AFTER_NTT
  rand_poly(a);
  std::memcpy(ref, a, sizeof(Poly));
  oracle::LineRam ram;
  oracle::reshape(&ram, a);
  oracle::lineram_fwdntt(&ram, oracle::Mapping::kNatural);
  oracle::ntt(ref);
  Poly got;
  oracle::extract(ram, oracle::Mapping::kAfterNtt, got);
  err |= poly_eq(got, ref, "lineram fwd NATURAL->AFTER_NTT");

  // line layout: inverse from NATURAL reads back under AFTER_INVNTT
  rand_poly(a);
  std::memcpy(ref, a, sizeof(Poly));
  oracle::reshape(&ram, a);
  oracle::lineram_invntt(&ram, oracle::Mapping::kNatural);
  oracle::invntt(ref);
  oracle::extract(ram, oracle::Mapping::kAfterInvntt, got);
  err |= poly_eq(got, ref, "lineram inv NATURAL->AFTER_INVNTT");

  // staged (pipeline-ordered) model == behavioral model, bit-identical RAM
  // contents, from both layouts an op can start under in the real chains
  rand_poly(a);
  {
    oracle::LineRam rs, rbm;
    oracle::reshape(&rs, a);
    rbm = rs;
    oracle::staged_fwdntt(&rs, oracle::Mapping::kNatural);
    oracle::lineram_fwdntt(&rbm, oracle::Mapping::kNatural);
    err |= std::memcmp(&rs, &rbm, sizeof rs) != 0;
    if (err) std::printf("MISMATCH staged fwd vs behavioral (NATURAL)\n");
    // chain the inverse from the forward's output layout
    oracle::staged_invntt(&rs, oracle::Mapping::kAfterNtt);
    oracle::lineram_invntt(&rbm, oracle::Mapping::kAfterNtt);
    err |= std::memcmp(&rs, &rbm, sizeof rs) != 0;
    if (err) std::printf("MISMATCH staged inv vs behavioral (AFTER_NTT)\n");
  }
  rand_poly(a);
  {
    oracle::LineRam rs, rbm;
    oracle::reshape(&rs, a);
    rbm = rs;
    oracle::staged_invntt(&rs, oracle::Mapping::kNatural);
    oracle::lineram_invntt(&rbm, oracle::Mapping::kNatural);
    err |= std::memcmp(&rs, &rbm, sizeof rs) != 0;
    if (err) std::printf("MISMATCH staged inv vs behavioral (NATURAL)\n");
  }

  // full chain: fwd(a), fwd(b), mul, inv lands back on NATURAL
  rand_poly(a);
  rand_poly(b);
  oracle::LineRam ra, rb;
  oracle::reshape(&ra, a);
  oracle::reshape(&rb, b);
  oracle::lineram_fwdntt(&ra, oracle::Mapping::kNatural);
  oracle::lineram_fwdntt(&rb, oracle::Mapping::kNatural);
  oracle::lineram_mul(&ra, rb, oracle::Mapping::kNatural);
  oracle::lineram_invntt(&ra, oracle::Mapping::kAfterNtt);
  oracle::extract(ra, oracle::Mapping::kNatural, got);

  // golden chain through the textbook path (plain slotwise product of
  // canonical NTT outputs, then the plain inverse)
  oracle::ntt(a);
  oracle::ntt(b);
  for (int i = 0; i < kN; ++i)
    ref[i] = int32_t(int64_t(a[i]) * b[i] % kQ);
  oracle::invntt(ref);
  err |= poly_eq(got, ref, "lineram polymul chain vs textbook");

  if (with_schoolbook) {
    Poly gold;
    // recover the pre-NTT inputs is not possible here; do a fresh pair
    Poly x, y;
    rand_poly(x);
    rand_poly(y);
    schoolbook(gold, x, y);
    oracle::LineRam rx, ry;
    oracle::reshape(&rx, x);
    oracle::reshape(&ry, y);
    oracle::lineram_fwdntt(&rx, oracle::Mapping::kNatural);
    oracle::lineram_fwdntt(&ry, oracle::Mapping::kNatural);
    oracle::lineram_mul(&rx, ry, oracle::Mapping::kNatural);
    oracle::lineram_invntt(&rx, oracle::Mapping::kAfterNtt);
    oracle::extract(rx, oracle::Mapping::kNatural, got);
    err |= poly_eq(got, gold, "polymul chain vs schoolbook");
  }
  return err;
}

int main(int argc, char** argv) {
  int iters = argc > 1 ? std::atoi(argv[1]) : 20000;
  const char* zpath = argc > 2 ? argv[2] : "/root/reference/zetas.txt";
  int err = check_zetas_file(zpath);
  for (int k = 0; k < iters && !err; ++k)
    err |= one_iteration(/*with_schoolbook=*/k < 8);
  if (err) {
    std::printf("ERROR\n");
    return 1;
  }
  std::printf("ntt2x2 differential tests OK (%d iterations)\n", iters);
  return 0;
}
