"""Keygen stage decomposition + compaction A/Bs — where do 12.8 us/key go?

VERDICT r3 #6: L3 keygen measured 12.8 us/key (78k keypairs/sec) with
ExpandA at ~7 us of it, while the XOF budget says the 30-poly SHAKE128
sweep should be ~2-3 us. This tool times each keygen stage standalone at
a given key batch and A/Bs the rejection-compaction variants so the next
optimization is chosen from measurements, not guesses.

Usage: python tools/keygen_exp.py [batch=2048] [level=3]
Stages go to stderr; a JSON summary to stdout.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(out):
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.uint32)))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    from dilithium_tpu import params, scheme
    from dilithium_tpu.ops import keccak, ntt, pack, rounding, sampling
    from dilithium_tpu.ops.pack import unpack_bits_w
    from dilithium_tpu.ops.reduce import add_mod
    from dilithium_tpu.params import (
        CRHBYTES, N, Q, SEEDBYTES, SHAKE128_RATE, TRBYTES,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    p = params.get_params(level)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, batch {B}, level {level}",
          file=sys.stderr)

    results = {}

    def report(name, secs):
        results[name] = round(secs / B * 1e6, 3)
        print(f"{name:34s} {secs*1e3:9.2f} ms  ({secs/B*1e6:7.2f} us/key)",
              file=sys.stderr)

    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    kp = scheme.keygen(seed, p)  # warm constants

    # stage 1: seed expansion
    f = jax.jit(lambda s: keccak.shake256(s, 2 * SEEDBYTES + CRHBYTES))
    report("seedbuf", timeit(f, seed))
    seedbuf = f(seed)
    rho = seedbuf[..., :SEEDBYTES]
    sigma = seedbuf[..., SEEDBYTES:SEEDBYTES + CRHBYTES]

    # stage 2: ExpandA — full, and XOF-only (squeeze without compaction)
    f = jax.jit(lambda r: sampling.expand_a(r, p))
    report("expand_a", timeit(f, rho, iters=3))

    KL = p.K * p.L
    nonces = jnp.asarray(
        [(i << 8) + j for i in range(p.K) for j in range(p.L)], dtype=jnp.uint32
    )
    def xof_only(rho_):
        msgs = jnp.concatenate(
            [
                jnp.broadcast_to(rho_[..., None, :], (B, KL, 32)),
                jnp.broadcast_to(sampling._le16(nonces), (B, KL, 2)),
            ],
            axis=-1,
        )
        nbytes = p.uniform_blocks * SHAKE128_RATE
        return keccak.shake128_words(msgs, nbytes // 4)
    f = jax.jit(xof_only)
    report("expand_a.xof_words", timeit(f, rho, iters=3))
    words_a = f(rho)

    # unpack + accept only (no compaction)
    def unpack_only(words):
        cand = unpack_bits_w(words, 24) & jnp.uint32(0x7FFFFF)
        return cand, cand < jnp.uint32(Q)
    f = jax.jit(unpack_only)
    report("expand_a.unpack", timeit(f, words_a, iters=3))
    cand_a, acc_a = f(words_a)

    # compaction variants
    for skips in (12, 6, 4):
        f = jax.jit(lambda c, a, s=skips: sampling._rank_compact_sparse(c, a, N, s))
        report(f"expand_a.compact_sparse{skips}", timeit(f, cand_a, acc_a, iters=3))

    # stage 3: ExpandS (both vectors)
    def es(sig_):
        s1, ok1 = sampling.expand_s(sig_, 0, p.L, p)
        s2, ok2 = sampling.expand_s(sig_, p.L, p.K, p)
        return s1, s2
    f = jax.jit(es)
    report("expand_s", timeit(f, sigma, iters=3))
    s1, s2 = f(sigma)

    # stage 4: NTT chain t = INTT(A.NTT(s1)) + s2 ; power2round
    a_hat, _ = jax.jit(lambda r: sampling.expand_a(r, p))(rho)
    def chain(a_, s1_, s2_):
        t = ntt.invntt(ntt.matvec(a_, ntt.ntt(s1_)), from_product=True)
        t = add_mod(t, s2_)
        return rounding.power2round(t)
    f = jax.jit(chain)
    report("ntt_chain+p2r", timeit(f, a_hat, s1, s2))
    t1, t0 = f(a_hat, s1, s2)

    # stage 5: pack pk, tr hash (15-block absorb at L3), pack sk
    f = jax.jit(lambda r, t: pack.pack_pk(r, t, p))
    report("pack_pk", timeit(f, rho, t1))
    pk = f(rho, t1)
    f = jax.jit(lambda x: keccak.shake256(x, TRBYTES))
    report("tr_hash", timeit(f, pk))
    key = seedbuf[..., SEEDBYTES + CRHBYTES:]
    tr = f(pk)
    f = jax.jit(lambda *a: pack.pack_sk(*a, p))
    report("pack_sk", timeit(f, rho, key, tr, s1, s2, t0))

    # end to end
    f = jax.jit(lambda s: scheme.keygen(s, p).sk)
    report("keygen_e2e", timeit(f, seed, iters=3))

    print(json.dumps({"batch": B, "level": level, "us_per_key": results}))


if __name__ == "__main__":
    main()
