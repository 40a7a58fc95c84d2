"""Stage-level timing of one MXU sign-round body at the operating window.

The elastic stream signer runs ~ Q*mean_attempts/W while-loop rounds; each
round evaluates `mxu._sign_attempt_mxu` on W slots plus scheduler commit
work. This times each stage of the attempt body as its own jitted graph at
B = W, to locate the current bottleneck at the shipped operating point
(W=768 after the lean-scheduler re-sweep — the old W=4096 trace table in
docs/PERF.md predates it).

Usage: python tools/profile_sign.py [window] [level]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(out):
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.uint32)))


def timeit(fn, *args, iters=30):
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
    from dilithium_tpu import params, scheme, mxu
    from dilithium_tpu.ops import keccak, pack, rounding, sampling
    from dilithium_tpu.params import N, CRHBYTES

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    p = params.get_params(level)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, window: {W}, level: {level}",
          file=sys.stderr)

    def report(name, secs):
        print(f"{name:30s} {secs*1e6:9.1f} us/round   ({secs/W*1e9:8.1f} ns/slot)",
              file=sys.stderr, flush=True)

    seed = jnp.asarray(rng.integers(0, 256, (1, 32), dtype=np.uint8))
    kp = scheme.keygen(seed, p)
    ops = mxu.build_operators(kp.sk[0], p)
    mu = jnp.asarray(rng.integers(0, 256, (W, 64), dtype=np.uint8))
    rp = jnp.asarray(rng.integers(0, 256, (W, CRHBYTES), dtype=np.uint8))
    kappa = jnp.asarray(np.arange(W, dtype=np.uint32) * p.L)
    sync(ops.wy_cat)

    report("attempt body (full)",
           timeit(jax.jit(lambda m, r, k: mxu._sign_attempt_mxu(ops, m, r, k, p)),
                  mu, rp, kappa))

    report("expand_mask (XOF+unpack)",
           timeit(jax.jit(lambda r, k: sampling.expand_mask(r, k, p)), rp, kappa))

    y = jax.jit(lambda r, k: sampling.expand_mask(r, k, p))(rp, kappa)
    yf = y.reshape(W, p.L * N)
    report("y -> w (9 int8 matmuls)",
           timeit(jax.jit(lambda z, w: mxu._apply_wy(z, w, p)), yf, ops.wy_limbs))

    w = jax.jit(lambda z, wl: mxu._apply_wy(z, wl, p))(yf, ops.wy_limbs).reshape(W, p.K, N)
    report("decompose",
           timeit(jax.jit(lambda x: rounding.decompose(x, p)), w))
    w1, w0 = jax.jit(lambda x: rounding.decompose(x, p))(w)
    report("pack_w1",
           timeit(jax.jit(lambda x: pack.pack_w1(x, p)), w1))
    w1p = jax.jit(lambda x: pack.pack_w1(x, p))(w1).reshape(W, p.K * p.polyw1_packedbytes)
    report("c_tilde hash (absorb-heavy)",
           timeit(jax.jit(lambda m, wp: keccak.shake256(
               jnp.concatenate([m, wp], axis=-1), 32)), mu, w1p))
    ct = jax.jit(lambda m, wp: keccak.shake256(
        jnp.concatenate([m, wp], axis=-1), 32))(mu, w1p)
    report("sample_in_ball",
           timeit(jax.jit(lambda c: sampling.sample_in_ball(c, p)), ct))

    c, _ = jax.jit(lambda c: sampling.sample_in_ball(c, p))(ct)
    from dilithium_tpu.ops.reduce import center
    c_i8 = jax.jit(lambda cc: center(cc).astype(jnp.int8))(c)

    def tail(ci, yy, ww0, ww1):
        cs1 = mxu._dot_i8(ci, ops.s1_mat).reshape(W, p.L, N)
        from dilithium_tpu.ops.reduce import uncenter
        z = uncenter(center(yy).astype(jnp.int32) + cs1)
        rej_z = rounding.norm_exceeds(z, p.gamma1 - p.beta, axis=(-2, -1))
        cs2 = mxu._dot_i8(ci, ops.s2_mat).reshape(W, p.K, N)
        w0_cs2 = ww0 - cs2
        rej_w0 = rounding.norm_exceeds(w0_cs2, p.gamma2 - p.beta, axis=(-2, -1))
        ct0_lo = mxu._dot_i8(ci, ops.t0_lo)
        ct0_hi = mxu._dot_i8(ci, ops.t0_hi)
        ct0 = (ct0_lo + (ct0_hi << 7)).reshape(W, p.K, N)
        rej_t0 = rounding.norm_exceeds(ct0, p.gamma2, axis=(-2, -1))
        h = rounding.make_hint(w0_cs2 + ct0, ww1, p)
        return z, h, rej_z | rej_w0 | rej_t0

    report("cs1/cs2/ct0+norms+hints",
           timeit(jax.jit(tail), c_i8, y, w0, w1))


if __name__ == "__main__":
    main()
