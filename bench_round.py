"""Time the sign_stream round body vs the bare attempt — loop overhead audit.

The stream signer's throughput = window / (round time x mean_attempts /
... ). Everything in the round that is not _sign_attempt (pack_sig, hint
codec, output scatter, refill bookkeeping) is overhead this script
isolates, at a given window size, on the current default device.

Usage: python bench_round.py [window]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def sync(out):
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.uint32)))


def timeit(fn, *args, iters=10):
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
    from dilithium_tpu.ops import pack

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    p = params.get_params(3)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, window: {W}", file=sys.stderr)

    seed = jnp.asarray(rng.integers(0, 256, (32,), dtype=np.uint8))
    kp = scheme.keygen(seed, p)
    ek = scheme.expand_sk(kp.sk, p)
    sync(ek.a_hat)

    def bcast(x):
        return jnp.broadcast_to(x, (W,) + x.shape)

    a_hat, s1h, s2h, t0h = map(bcast, (ek.a_hat, ek.s1_hat, ek.s2_hat, ek.t0_hat))
    mu = jnp.asarray(rng.integers(0, 256, (W, 64), dtype=np.uint8))
    rp = jnp.asarray(rng.integers(0, 256, (W, 64), dtype=np.uint8))
    kap = jnp.zeros((W,), dtype=jnp.uint32)

    f_att = jax.jit(
        lambda *a: scheme._sign_attempt(*a, p)
    )
    t = timeit(f_att, a_hat, s1h, s2h, t0h, mu, rp, kap, iters=10)
    print(f"attempt only        : {t*1e3:8.2f} ms  ({t/W*1e6:6.2f} us/lane)",
          file=sys.stderr)

    def att_plus_pack(a_hat, s1h, s2h, t0h, mu, rp, kap):
        c_tilde, z, h, accept = scheme._sign_attempt(a_hat, s1h, s2h, t0h, mu, rp, kap, p)
        return pack.pack_sig(c_tilde, z, h, p), accept

    f_pk = jax.jit(att_plus_pack)
    t2 = timeit(f_pk, a_hat, s1h, s2h, t0h, mu, rp, kap, iters=10)
    print(f"attempt + pack_sig  : {t2*1e3:8.2f} ms  (+{(t2-t)/W*1e6:6.2f} us/lane)",
          file=sys.stderr)

    # one full stream round including refill bookkeeping, via a 1-round run
    f_stream = jax.jit(
        lambda mu_q: scheme.sign_stream(ek, mu_q, p, window=W, max_rounds=1)
    )
    t3 = timeit(f_stream, mu, iters=10)
    print(f"full round (1-round stream): {t3*1e3:8.2f} ms  (+{(t3-t2)/W*1e6:6.2f} us/lane vs pack)",
          file=sys.stderr)

    # steady-state throughput estimate
    res = scheme.sign_stream(ek, mu, p, window=W, max_rounds=8192)
    sync(res.sig)
    t0 = time.time()
    res = scheme.sign_stream(ek, mu, p, window=W, max_rounds=8192)
    sync(res.sig)
    el = time.time() - t0
    print(f"stream W={W}, Q={W}: {el:.3f}s -> {W/el:.0f} signs/sec",
          file=sys.stderr)


if __name__ == "__main__":
    main()
