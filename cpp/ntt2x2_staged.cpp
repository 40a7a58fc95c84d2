// Pipeline-ordered ("staged") model of the reference NTT engine's dataflow.
//
// The behavioral model in `ntt2x2.cpp` captures the engine's value and
// layout contract (fused 2-level butterflies + the AFTER_NTT/AFTER_INVNTT
// address permutations). This file models the remaining structural layer of
// the reference's hardware model (`hardware_code/ntt2x2_fwdntt.cpp:62-157`,
// `ntt2x2_invntt.cpp:67-161`, `fifo.h`): the ORDER in which the engine
// touches BRAM. Per pass, lines are read by the stride walk of
// `address_unit.v:88-93` (`fw_ntt_pattern = {4,2,0,4}`, inverse strides
// 1/4/16/64); every four consecutive reads form a group that is
// corner-turned through the four staggered PISOs (depths 4/6/5/7,
// `fifo.h:32-37`) so the 2x2 butterfly consumes COLUMNS spanning the four
// lines; results are written back to the group's own addresses one group
// later through the index delay line (`fifo_i`, depth 4 forward / 3
// inverse), which is what makes the in-place pass race-free in RTL.
//
// Instead of replaying register-exact FIFO shuffles, every value carries a
// TAG = the logical coefficient index it holds. The model asserts, at every
// butterfly, that the four tags form a clean NTT group for the pass (an
// arithmetic progression at the pass stride) — the invariant the FIFO skew
// network exists to establish — and routes each output column to the
// written line by tag order. `staged_fwdntt`/`staged_invntt` must produce
// BIT-IDENTICAL LineRam contents to `lineram_fwdntt`/`lineram_invntt`
// (pinned by cpp/ntt2x2_test.cpp), proving the staged dataflow and the
// layout-permutation contract are the same function.

#include <cstdio>
#include <cstdlib>

#include "ntt2x2.h"

namespace oracle {

namespace {

struct Flow {
  int32_t v[4];  // values of one line
  int tag[4];    // logical coefficient index each slot holds
};

[[noreturn]] void die(const char* what, int pass, int group) {
  std::fprintf(stderr, "staged ntt2x2: %s (pass %d, group %d)\n", what, pass,
               group);
  std::abort();
}

// Check the four tags form {c0, c0+quarter, c0+2q, c0+3q} with c0 in the
// first quarter of its block, returning (c0, base). The tags arrive sorted.
void check_group(const int tags[4], int quarter, int pass, int group,
                 int* c0_out, int* base_out) {
  int c0 = tags[0];
  for (int m = 1; m < 4; ++m)
    if (tags[m] != c0 + m * quarter)
      die("butterfly operands are not a clean NTT group", pass, group);
  int block = 4 * quarter;
  int base = (c0 / block) * block;
  if (c0 - base >= quarter)
    die("group leader outside the first quarter of its block", pass, group);
  *c0_out = c0;
  *base_out = base;
}

void sort_by_tag(Flow* f) {
  for (int a = 0; a < 4; ++a)
    for (int b = a + 1; b < 4; ++b)
      if (f->tag[b] < f->tag[a]) {
        int t = f->tag[a]; f->tag[a] = f->tag[b]; f->tag[b] = t;
        int32_t v = f->v[a]; f->v[a] = f->v[b]; f->v[b] = v;
      }
}

// Two fused CT levels on a tag-sorted group (the forward 2x2 butterfly,
// `butterfly_unit.h:112-196` semantics; zeta selection as in ntt2x2.cpp).
void bf_forward(Flow* f, int quarter, int base) {
  int block = 4 * quarter;
  int k1 = (kN + base) / block;
  int32_t z1 = plain_zeta(k1);
  int32_t z20 = plain_zeta(2 * k1);
  int32_t z21 = plain_zeta(2 * k1 + 1);
  auto ct = [](int32_t* a, int32_t* b, int32_t z) {
    int32_t t = plain_mul(*b, z);
    *b = plain_sub(*a, t);
    *a = plain_add(*a, t);
  };
  ct(&f->v[0], &f->v[2], z1);
  ct(&f->v[1], &f->v[3], z1);
  ct(&f->v[0], &f->v[1], z20);
  ct(&f->v[2], &f->v[3], z21);
}

// Two fused GS levels with the div2 fold (inverse 2x2 butterfly).
void bf_inverse(Flow* f, int quarter, int base) {
  int k1 = (kN - base / 2) / quarter - 1;
  int k2 = (kN - base / 2) / (2 * quarter) - 1;
  int32_t z10 = plain_sub(0, plain_zeta(k1));
  int32_t z11 = plain_sub(0, plain_zeta(k1 - 1));
  int32_t z2 = plain_sub(0, plain_zeta(k2));
  auto gs = [](int32_t* a, int32_t* b, int32_t nz) {
    int32_t t = plain_div2(plain_sub(*a, *b));
    *a = plain_div2(plain_add(*a, *b));
    *b = plain_mul(t, nz);
  };
  gs(&f->v[0], &f->v[1], z10);
  gs(&f->v[2], &f->v[3], z11);
  gs(&f->v[0], &f->v[2], z2);
  gs(&f->v[1], &f->v[3], z2);
}

// The stride walk of `address_unit.v:88-93` / `ntt2x2_fwdntt.cpp:118-136`:
// logical line addresses k + j with k advancing by `stride` and wrapping.
void walk_addresses(int stride, unsigned out[kN / 4]) {
  unsigned k = 0, j = 0;
  for (int i = 0; i < kN / 4; ++i) {
    out[i] = k + j;
    if (k + stride < unsigned(kN / 4)) {
      k += stride;
    } else {
      k = 0;
      ++j;
    }
  }
}

}  // namespace

void staged_fwdntt(LineRam* ram, Mapping mapping) {
  // Per-pass read strides (lines): 16, 4, 1, 16 — `fw_ntt_pattern {4,2,0,4}`
  // in address bits. The pass-p butterfly group spans coefficients at
  // stride quarter = 64 >> 2p (block sizes 256, 64, 16, 4).
  static const int kStride[4] = {16, 4, 1, 16};
  static const int kQuarter[4] = {64, 16, 4, 1};

  int tag[kN / 4][4];
  for (int a = 0; a < kN / 4; ++a) {
    unsigned phys = resolve_address(mapping, unsigned(a));
    for (int s = 0; s < 4; ++s) tag[phys][s] = 4 * a + s;
  }

  for (int pass = 0; pass < 4; ++pass) {
    unsigned order[kN / 4];
    walk_addresses(kStride[pass], order);
    for (int g = 0; g < kN / 16; ++g) {
      // Read the group's four lines (the PISO fill phase, cycles 4g..4g+3).
      unsigned phys[4];
      Flow lines[4];
      for (int t = 0; t < 4; ++t) {
        phys[t] = resolve_address(mapping, order[4 * g + t]);
        for (int s = 0; s < 4; ++s) {
          lines[t].v[s] = ram->lines[phys[t]][s];
          lines[t].tag[s] = tag[phys[t]][s];
        }
      }
      // Corner-turn: butterfly input c (cycles 4g+4+c of the RTL) is column
      // c across the four lines; compute all four columns of the group.
      Flow cols[4];
      for (int c = 0; c < 4; ++c) {
        for (int t = 0; t < 4; ++t) {
          cols[c].v[t] = lines[t].v[c];
          cols[c].tag[t] = lines[t].tag[c];
        }
        sort_by_tag(&cols[c]);
        int c0, base;
        check_group(cols[c].tag, kQuarter[pass], pass, g, &c0, &base);
        bf_forward(&cols[c], kQuarter[pass], base);
      }
      // Delayed writeback (`fifo_i` depth 4): output column t lands at the
      // address read 4 cycles earlier — the group's own line t.
      for (int t = 0; t < 4; ++t) {
        for (int s = 0; s < 4; ++s) {
          ram->lines[phys[t]][s] = cols[t].v[s];
          tag[phys[t]][s] = cols[t].tag[s];
        }
      }
    }
  }

  // Final layout check: the staged dataflow must land exactly on the
  // behavioral model's permutation contract — logical line i readable at
  // resolve(after_fwdntt(mapping), i) in natural intra-line order.
  Mapping after = after_fwdntt(mapping);
  for (int i = 0; i < kN / 4; ++i) {
    unsigned phys = resolve_address(after, unsigned(i));
    for (int s = 0; s < 4; ++s)
      if (tag[phys][s] != 4 * i + s)
        die("final layout disagrees with AFTER_NTT", 4, i);
  }
}

void staged_invntt(LineRam* ram, Mapping mapping) {
  // Inverse strides are 1, 4, 16, 64 (`s = l`, `ntt2x2_invntt.cpp:120-127`);
  // pass-p groups span coefficients at stride quarter = 4^p. Each READ LINE
  // is one butterfly group (the previous pass's corner-turn arranged it);
  // the corner-turn sits on the WRITE side (outputs pushed serially into
  // the staggered FIFOs, lines re-formed from columns, `fifo.h:113-157`)
  // with the index delay at depth 3.
  static const int kStride[4] = {1, 4, 16, 64};
  static const int kQuarter[4] = {1, 4, 16, 64};

  int tag[kN / 4][4];
  for (int a = 0; a < kN / 4; ++a) {
    unsigned phys = resolve_address(mapping, unsigned(a));
    for (int s = 0; s < 4; ++s) tag[phys][s] = 4 * a + s;
  }

  for (int pass = 0; pass < 4; ++pass) {
    unsigned order[kN / 4];
    walk_addresses(kStride[pass], order);
    for (int g = 0; g < kN / 16; ++g) {
      unsigned phys[4];
      Flow rows[4];
      for (int t = 0; t < 4; ++t) {
        phys[t] = resolve_address(mapping, order[4 * g + t]);
        for (int s = 0; s < 4; ++s) {
          rows[t].v[s] = ram->lines[phys[t]][s];
          rows[t].tag[s] = tag[phys[t]][s];
        }
        sort_by_tag(&rows[t]);
        int c0, base;
        check_group(rows[t].tag, kQuarter[pass], pass, g, &c0, &base);
        bf_inverse(&rows[t], kQuarter[pass], base);
      }
      // Write-side corner-turn: the line written back to the group's
      // address t is a COLUMN across the four butterfly outputs.
      for (int t = 0; t < 4; ++t) {
        Flow col;
        for (int r = 0; r < 4; ++r) {
          col.v[r] = rows[r].v[t];
          col.tag[r] = rows[r].tag[t];
        }
        for (int s = 0; s < 4; ++s) {
          ram->lines[phys[t]][s] = col.v[s];
          tag[phys[t]][s] = col.tag[s];
        }
      }
    }
  }

  Mapping after = after_invntt(mapping);
  for (int i = 0; i < kN / 4; ++i) {
    unsigned phys = resolve_address(after, unsigned(i));
    for (int s = 0; s < 4; ++s)
      if (tag[phys][s] != 4 * i + s)
        die("final layout disagrees with AFTER_INVNTT", 4, i);
  }
}

}  // namespace oracle
