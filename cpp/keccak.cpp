#include "keccak.h"

#include <cstring>

namespace oracle {

namespace {

constexpr uint64_t kRoundConstants[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

// rho rotation offsets for lane (x, y) at index x + 5*y
constexpr unsigned kRho[25] = {
    0,  1,  62, 28, 27,  //
    36, 44, 6,  55, 20,  //
    3,  10, 43, 25, 39,  //
    41, 45, 15, 21, 8,   //
    18, 2,  61, 56, 14,  //
};

inline uint64_t rotl(uint64_t v, unsigned r) {
  return r == 0 ? v : (v << r) | (v >> (64 - r));
}

}  // namespace

void keccak_f1600(uint64_t s[25]) {
  for (int round = 0; round < 24; ++round) {
    // theta
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20];
    for (int x = 0; x < 5; ++x) {
      d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
      for (int y = 0; y < 5; ++y) s[x + 5 * y] ^= d[x];
    }
    // rho + pi: B[y][2x+3y] = rotl(A[x][y])
    uint64_t b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(s[x + 5 * y], kRho[x + 5 * y]);
    // chi
    for (int y = 0; y < 5; ++y)
      for (int x = 0; x < 5; ++x)
        s[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    // iota
    s[0] ^= kRoundConstants[round];
  }
}

void KeccakState::absorb(const uint8_t* data, size_t len) {
  while (len > 0) {
    size_t take = rate - pos;
    if (take > len) take = len;
    for (size_t i = 0; i < take; ++i)
      s[(pos + i) / 8] ^= uint64_t(data[i]) << (8 * ((pos + i) % 8));
    data += take;
    len -= take;
    pos += take;
    if (pos == rate) {
      keccak_f1600(s);
      pos = 0;
    }
  }
}

void KeccakState::finalize(uint8_t domain) {
  s[pos / 8] ^= uint64_t(domain) << (8 * (pos % 8));
  s[(rate - 1) / 8] ^= 0x80ULL << (8 * ((rate - 1) % 8));
  keccak_f1600(s);
  pos = 0;
  squeezing_ = true;
}

void KeccakState::squeeze(uint8_t* out, size_t len) {
  while (len > 0) {
    if (pos == rate) {
      keccak_f1600(s);
      pos = 0;
    }
    size_t take = rate - pos;
    if (take > len) take = len;
    for (size_t i = 0; i < take; ++i)
      out[i] = uint8_t(s[(pos + i) / 8] >> (8 * ((pos + i) % 8)));
    out += take;
    len -= take;
    pos += take;
  }
}

void shake128(uint8_t* out, size_t outlen, const uint8_t* in, size_t inlen) {
  KeccakState st(168);
  st.absorb(in, inlen);
  st.finalize();
  st.squeeze(out, outlen);
}

void shake256(uint8_t* out, size_t outlen, const uint8_t* in, size_t inlen) {
  KeccakState st(136);
  st.absorb(in, inlen);
  st.finalize();
  st.squeeze(out, outlen);
}

}  // namespace oracle
