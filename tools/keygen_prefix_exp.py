"""Cumulative-prefix timing of keygen — fused costs, not standalone stages.

Standalone per-stage timing at small batch is dispatch-floor noise through
the tunnel (tools/keygen_exp.py showed stages summing to 3x the e2e time).
Here each measurement jits keygen TRUNCATED after stage k; differences
between consecutive prefixes are the marginal fused cost of each stage at
the same dispatch overhead.

Usage: python tools/keygen_prefix_exp.py [batch=8192] [level=3]
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
    from dilithium_tpu import params
    from dilithium_tpu.ops import keccak, ntt, pack, rounding, sampling
    from dilithium_tpu.ops.reduce import add_mod, uncenter
    from dilithium_tpu.params import CRHBYTES, SEEDBYTES, TRBYTES

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    p = params.get_params(level)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, batch {B}, level {level}",
          file=sys.stderr)

    seed = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))

    def prefix(stage):
        def f(s):
            seedbuf = keccak.shake256(s, 2 * SEEDBYTES + CRHBYTES)
            rho = seedbuf[..., :SEEDBYTES]
            sigma = seedbuf[..., SEEDBYTES:SEEDBYTES + CRHBYTES]
            key = seedbuf[..., SEEDBYTES + CRHBYTES:]
            if stage == 0:
                return seedbuf
            # max_skips=8 matches production keygen (`scheme.keygen`)
            a_hat, _ = sampling.expand_a(rho, p, max_skips=8)
            if stage == 1:
                return a_hat
            # one fused ExpandS over nonces 0..L+K-1 — matches production
            # keygen (`scheme.keygen`), so the stage-2 marginal is the
            # shipped banded-compaction cost
            s12, _ = sampling.expand_s(sigma, 0, p.L + p.K, p)
            s1 = s12[..., :p.L, :]
            s2 = s12[..., p.L:, :]
            if stage == 2:
                return s1, s2, a_hat
            t = ntt.invntt(ntt.matvec(a_hat, ntt.ntt(s1)), from_product=True)
            t = add_mod(t, s2)
            t1, t0 = rounding.power2round(t)
            if stage == 3:
                return t1, t0
            pk = pack.pack_pk(rho, t1, p)
            tr = keccak.shake256(pk, TRBYTES)
            sk = pack.pack_sk(rho, key, tr, s1, s2, t0, p)
            return pk, sk
        return jax.jit(f)

    names = ["seedbuf", "+expand_a", "+expand_s", "+ntt_chain", "+pack/tr (full)"]
    prev = 0.0
    results = {}
    for k, name in enumerate(names):
        t = timeit(prefix(k), seed)
        results[name] = {
            "cum_us_per_key": round(t / B * 1e6, 3),
            "marginal_us_per_key": round((t - prev) / B * 1e6, 3),
        }
        print(f"{name:18s} cum {t/B*1e6:7.2f} us/key   marginal "
              f"{(t-prev)/B*1e6:7.2f} us/key", file=sys.stderr, flush=True)
        prev = t

    print(json.dumps({"batch": B, "level": level, "stages": results}))


if __name__ == "__main__":
    main()
