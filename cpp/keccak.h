// FIPS-202 Keccak/SHAKE — host oracle implementation.
// Role parity: the reference's VHDL Keccak core (rtl_src/keccak_*.vhd);
// written from the FIPS-202 specification, not translated from any source.
#pragma once

#include <cstddef>
#include <cstdint>

namespace oracle {

struct KeccakState {
  uint64_t s[25] = {0};
  unsigned pos = 0;  // byte position within the rate block
  unsigned rate;     // rate in bytes: 168 (SHAKE128) or 136 (SHAKE256)

  explicit KeccakState(unsigned rate_bytes) : rate(rate_bytes) {}

  void absorb(const uint8_t* data, size_t len);
  void finalize(uint8_t domain = 0x1F);  // pad10*1 with SHAKE domain
  void squeeze(uint8_t* out, size_t len);

 private:
  bool squeezing_ = false;
};

void keccak_f1600(uint64_t s[25]);

void shake128(uint8_t* out, size_t outlen, const uint8_t* in, size_t inlen);
void shake256(uint8_t* out, size_t outlen, const uint8_t* in, size_t inlen);

}  // namespace oracle
