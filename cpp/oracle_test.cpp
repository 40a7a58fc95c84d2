// Standalone oracle self-test against the KAT corpus.
// Analog of the reference testbenches (`rtl_tb/tb_*_top.v`) but covering
// all 100 vectors per level (the TBs replay NUM_TV=5).
//
// Usage: oracle_test <KAT_DIR> [count]
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "dilithium.h"
#include "keccak.h"

namespace {

std::vector<std::vector<uint8_t>> load_hex(const std::string& path, int count) {
  std::vector<std::vector<uint8_t>> out;
  std::ifstream f(path);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(2);
  }
  std::string line;
  while (int(out.size()) < count && std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
      line.pop_back();
    std::vector<uint8_t> row(line.size() / 2);
    for (size_t i = 0; i < row.size(); ++i)
      row[i] = uint8_t(std::stoi(line.substr(2 * i, 2), nullptr, 16));
    out.push_back(std::move(row));
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  const std::string kat_dir = argc > 1 ? argv[1] : "/root/reference/KAT";
  const int count = argc > 2 ? std::atoi(argv[2]) : 100;
  int failures = 0;

  for (int level : {2, 3, 5}) {
    const auto& p = oracle::params(level);
    auto suffix = "_" + std::to_string(level) + ".txt";
    auto seeds = load_hex(kat_dir + "/z" + suffix, count);
    auto rhos = load_hex(kat_dir + "/rho" + suffix, count);
    auto trs = load_hex(kat_dir + "/tr" + suffix, count);
    auto t1s = load_hex(kat_dir + "/t1" + suffix, count);
    auto msgs = load_hex(kat_dir + "/m" + suffix, count);
    auto mlens = load_hex(kat_dir + "/mlen" + suffix, count);
    auto zss = load_hex(kat_dir + "/zs" + suffix, count);
    auto hs = load_hex(kat_dir + "/h" + suffix, count);
    auto cs = load_hex(kat_dir + "/c" + suffix, count);

    for (size_t i = 0; i < seeds.size(); ++i) {
      std::vector<uint8_t> pk(p.pk_bytes), sk(p.sk_bytes), sig(p.sig_bytes);
      oracle::keygen(level, seeds[i].data(), pk.data(), sk.data());
      if (std::memcmp(pk.data(), rhos[i].data(), 32) != 0 ||
          std::memcmp(pk.data() + 32, t1s[i].data(), t1s[i].size()) != 0) {
        std::printf("KG%d[%zu] FAIL\n", level, i);
        ++failures;
        continue;
      }
      // mlen is big-endian hex in the KAT; message is the first mlen bytes
      size_t mlen = 0;
      for (uint8_t b : mlens[i]) mlen = (mlen << 8) | b;
      // mu = CRH(tr || M)
      uint8_t mu[64];
      {
        oracle::KeccakState st(136);
        st.absorb(trs[i].data(), trs[i].size());
        st.absorb(msgs[i].data(), mlen);
        st.finalize();
        st.squeeze(mu, 64);
      }
      oracle::sign(level, sk.data(), mu, sig.data());
      if (std::memcmp(sig.data(), cs[i].data(), 32) != 0 ||
          std::memcmp(sig.data() + 32, zss[i].data(), zss[i].size()) != 0 ||
          std::memcmp(sig.data() + 32 + zss[i].size(), hs[i].data(),
                      hs[i].size()) != 0) {
        std::printf("SG%d[%zu] FAIL\n", level, i);
        ++failures;
        continue;
      }
      if (!oracle::verify(level, pk.data(), mu, sig.data())) {
        std::printf("VY%d[%zu] FAIL (rejected valid)\n", level, i);
        ++failures;
        continue;
      }
      sig[40] ^= 1;  // corrupt z
      if (oracle::verify(level, pk.data(), mu, sig.data())) {
        std::printf("VY%d[%zu] FAIL (accepted corrupted)\n", level, i);
        ++failures;
      }
    }
    std::printf("level %d: %zu vectors checked\n", level, seeds.size());
  }

  if (failures) {
    std::printf("FAILURES: %d\n", failures);
    return 1;
  }
  std::printf("all KAT vectors OK\n");
  return 0;
}
