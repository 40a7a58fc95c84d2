// C ABI for the host oracle — consumed via ctypes (dilithium_tpu/oracle.py).
// The environment has no pybind11; a plain C ABI keeps the binding layer
// dependency-free (role parity with the reference's host bus: a thin,
// typed streaming interface into the core, `combined_top.v:26-42`).
#include <cstdint>

#include "dilithium.h"
#include "keccak.h"

extern "C" {

int oracle_pk_bytes(int level) { return oracle::params(level).pk_bytes; }
int oracle_sk_bytes(int level) { return oracle::params(level).sk_bytes; }
int oracle_sig_bytes(int level) { return oracle::params(level).sig_bytes; }

void oracle_keygen(int level, const uint8_t* seed, uint8_t* pk, uint8_t* sk) {
  oracle::keygen(level, seed, pk, sk);
}

int oracle_sign(int level, const uint8_t* sk, const uint8_t* mu, uint8_t* sig) {
  return oracle::sign(level, sk, mu, sig);
}

int oracle_verify(int level, const uint8_t* pk, const uint8_t* mu,
                  const uint8_t* sig) {
  return oracle::verify(level, pk, mu, sig) ? 1 : 0;
}

// batched helpers (row-major, one vector per row)
void oracle_keygen_batch(int level, int n, const uint8_t* seeds, uint8_t* pks,
                         uint8_t* sks) {
  const auto& p = oracle::params(level);
  for (int i = 0; i < n; ++i)
    oracle::keygen(level, seeds + i * 32, pks + i * p.pk_bytes,
                   sks + i * p.sk_bytes);
}

void oracle_sign_batch(int level, int n, const uint8_t* sks, const uint8_t* mus,
                       uint8_t* sigs, int32_t* attempts) {
  const auto& p = oracle::params(level);
  for (int i = 0; i < n; ++i)
    attempts[i] = oracle::sign(level, sks + i * p.sk_bytes, mus + i * 64,
                               sigs + i * p.sig_bytes);
}

void oracle_verify_batch(int level, int n, const uint8_t* pks,
                         const uint8_t* mus, const uint8_t* sigs,
                         int32_t* results) {
  const auto& p = oracle::params(level);
  for (int i = 0; i < n; ++i)
    results[i] = oracle::verify(level, pks + i * p.pk_bytes, mus + i * 64,
                                sigs + i * p.sig_bytes)
                     ? 1
                     : 0;
}

// kernel-level primitives for differential tests
void oracle_ntt(int32_t* a) { oracle::ntt(a); }
void oracle_invntt(int32_t* a) { oracle::invntt(a); }
void oracle_pointwise(int32_t* c, const int32_t* a, const int32_t* b) {
  oracle::pointwise(c, a, b);
}
void oracle_shake256(uint8_t* out, int outlen, const uint8_t* in, int inlen) {
  oracle::shake256(out, size_t(outlen), in, size_t(inlen));
}
void oracle_shake128(uint8_t* out, int outlen, const uint8_t* in, int inlen) {
  oracle::shake128(out, size_t(outlen), in, size_t(inlen));
}

}  // extern "C"

// Multithreaded ragged-batch mu = CRH(tr || M) — the host half of the
// serving pipeline (`expandmask_ext.v:126-153` absorbs tr then M; here a
// thread pool amortizes it across a whole message queue: the Python
// hashlib loop costs ~3 us/message single-threaded, comparable to the
// device's per-sign time at batch 16k).
#include <algorithm>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// msgs: concatenated message bytes; offsets[n+1] delimit message i as
// [offsets[i], offsets[i+1]). trs: n x 32 row-major, or one shared 32-byte
// tr when tr_stride == 0. mus out: n x 64. nthreads <= 0 = hardware pick.
void oracle_crh_batch(int n, const uint8_t* trs, int tr_stride,
                      const uint8_t* msgs, const int64_t* offsets,
                      uint8_t* mus, int nthreads) {
  if (n <= 0) return;
  // 2x oversubscription hides the memcpy/stride stalls of the ragged
  // walk (measured: 8 threads 10.7 ms vs 4 threads 13.5 ms on 4 cores,
  // 16384 x 232-byte messages)
  if (nthreads <= 0) nthreads = 2 * int(std::thread::hardware_concurrency());
  nthreads = std::max(1, std::min(nthreads, n));
  auto work = [&](int t) {
    std::vector<uint8_t> buf;
    for (int i = t; i < n; i += nthreads) {
      const uint8_t* m = msgs + offsets[i];
      const size_t len = size_t(offsets[i + 1] - offsets[i]);
      buf.resize(32 + len);
      std::memcpy(buf.data(), trs + (tr_stride ? size_t(i) * tr_stride : 0), 32);
      if (len) std::memcpy(buf.data() + 32, m, len);
      oracle::shake256(mus + size_t(i) * 64, 64, buf.data(), buf.size());
    }
  };
  if (nthreads == 1) {
    work(0);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();
}

}  // extern "C"
