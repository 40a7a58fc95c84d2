"""A/B compaction microbench: banded one-hot vs log-shift vs sparse.

The rejection-compaction is keygen's compute dominator (r05 prefix
table: ExpandS 4.03 us/key, ExpandA 3.50 us/key marginal at B=16384).
`_rank_compact_logshift` replaces the one-hot's O(n_out * band)
compare-select-accumulate area with O(nbits * n_cand) shift-selects —
a ~30x op-count cut at the eta=4 shape. This tool times the forms at
the production shapes on the real chip.

Usage: python tools/compact_exp.py [nkeys=16384]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:64].astype(jnp.uint32)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from dilithium_tpu.ops import sampling

    nkeys = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, nkeys {nkeys}", file=sys.stderr)

    # eta=4 shape: 11 polys/key, 816 nibble candidates -> 256
    B = nkeys * 11
    nib = jnp.asarray(rng.integers(0, 16, size=(B, 816), dtype=np.uint8))
    acc = nib < 9

    f_band = jax.jit(lambda c, a: sampling._rank_compact_onehot_banded(
        c, a, 256, p_accept=9 / 16))
    f_log = jax.jit(lambda c, a: sampling._rank_compact_logshift(c, a, 256))
    f_pk = jax.jit(lambda c, a: sampling._rank_compact_logshift_packed(
        c, a, 256, val_bits=4, p_accept=9 / 16))
    for name, f in (("eta4 banded-onehot", f_band), ("eta4 log-shift", f_log),
                    ("eta4 log-shift-packed", f_pk),
                    ("eta4 banded-onehot(2)", f_band),
                    ("eta4 log-shift(2)", f_log),
                    ("eta4 log-shift-packed(2)", f_pk)):
        t = timeit(f, nib, acc, iters=5)
        print(f"{name:24s} {t*1e3:8.2f} ms  ({t/nkeys*1e6:6.3f} us/key)",
              flush=True)

    # eta=2 shape: 544 candidates, 15/16 accept
    nib2 = jnp.asarray(rng.integers(0, 16, size=(B, 544), dtype=np.uint8))
    acc2 = nib2 < 15
    f_sp = jax.jit(lambda c, a: sampling._rank_compact_sparse(
        c, a, 256, max_skips=64))
    f_log2 = jax.jit(lambda c, a: sampling._rank_compact_logshift(c, a, 256))
    f_pk2 = jax.jit(lambda c, a: sampling._rank_compact_logshift_packed(
        c, a, 256, val_bits=4, p_accept=15 / 16))
    for name, f in (("eta2 sparse(64)", f_sp), ("eta2 log-shift", f_log2),
                    ("eta2 log-shift-packed", f_pk2),
                    ("eta2 sparse(64)(2)", f_sp), ("eta2 log-shift(2)", f_log2),
                    ("eta2 log-shift-packed(2)", f_pk2)):
        t = timeit(f, nib2, acc2, iters=5)
        print(f"{name:24s} {t*1e3:8.2f} ms  ({t/nkeys*1e6:6.3f} us/key)",
              flush=True)

    # ExpandA shape: 30 polys/key (L3), 336 u32 candidates, ~1e-3 reject
    nk_a = min(nkeys, 2048)
    Ba = nk_a * 30
    ca = jnp.asarray(
        rng.integers(0, 1 << 23, size=(Ba, 336), dtype=np.int64).astype(np.uint32))
    aa = ca < jnp.uint32(8380417)
    # pack_hints shape: positions of ~55-80 set bits in [B, 1536] -> omega
    # slots (one-hot form shipped r04 at 5.8 ms / 16384)
    from dilithium_tpu import params as _params
    from dilithium_tpu.ops import pack as _pack
    p3 = _params.get_params(3)
    hw = (rng.random((nkeys, p3.K, 256)) < (50 / 1536)).astype(np.uint32)
    hj = jnp.asarray(hw)
    f_oh = jax.jit(lambda h: _pack.pack_hints(h, p3))
    gpos = jnp.asarray((np.arange(p3.K * 256) % 256).astype(np.uint8))

    def hints_logshift(h):
        hf = h.reshape(h.shape[:-2] + (p3.K * 256,))
        cand = jnp.broadcast_to(gpos, hf.shape)
        out, _ = sampling._rank_compact_logshift_packed(
            cand, hf == 1, p3.omega, val_bits=8
        )
        counts = jnp.cumsum(jnp.sum(h, axis=-1), axis=-1)
        return jnp.concatenate(
            [out.astype(jnp.uint8), counts.astype(jnp.uint8)], axis=-1
        )

    f_ls = jax.jit(hints_logshift)
    ref = np.asarray(f_oh(hj))
    got = np.asarray(f_ls(hj))
    print("hints logshift == onehot:", np.array_equal(ref, got), flush=True)
    for name, f in (("hints one-hot", f_oh), ("hints log-shift", f_ls),
                    ("hints one-hot(2)", f_oh), ("hints log-shift(2)", f_ls)):
        t = timeit(f, hj, iters=5)
        print(f"{name:24s} {t*1e3:8.2f} ms  ({t/nkeys*1e6:6.3f} us/msg)",
              flush=True)

    f_spa = jax.jit(lambda c, a: sampling._rank_compact_sparse(
        c, a, 256, max_skips=12))
    f_loga = jax.jit(lambda c, a: sampling._rank_compact_logshift(c, a, 256))
    f_logt = jax.jit(lambda c, a: sampling._rank_compact_logshift(
        c, a, 256, max_disp=15))
    for name, f in (("expA sparse(12)", f_spa), ("expA log-shift", f_loga),
                    ("expA log-shift-d15", f_logt),
                    ("expA sparse(12)(2)", f_spa), ("expA log-shift(2)", f_loga),
                    ("expA log-shift-d15(2)", f_logt)):
        t = timeit(f, ca, aa, iters=5)
        print(f"{name:24s} {t*1e3:8.2f} ms  ({t/nk_a*1e6:6.3f} us/key)",
              flush=True)


if __name__ == "__main__":
    main()
