"""Stage-level timing of the one-key MXU verify path at service batch.

Breaks `mxu.verify_mxu` into its pipeline stages and times each as its own
jitted graph on the real chip, to locate the gap between the measured
~3.5 us/verify and the int8-matmul roofline (~0.1 us at B=16k).

Usage: python tools/profile_verify.py [batch]
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
    from dilithium_tpu import params, scheme, mxu
    from dilithium_tpu.ops import keccak, pack, rounding, sampling

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    p = params.get_params(3)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}, batch: {B}", file=sys.stderr)

    def report(name, secs):
        print(f"{name:28s} {secs*1e3:9.2f} ms   ({secs/B*1e6:8.3f} us/sig)",
              file=sys.stderr, flush=True)

    # one key, B real signatures
    seed = jnp.asarray(rng.integers(0, 256, (1, 32), dtype=np.uint8))
    kp = scheme.keygen(seed, p)
    ek = scheme.expand_sk(kp.sk[0], p)
    mu = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))
    res = mxu.sign_stream_mxu(mxu.build_operators(kp.sk[0], p), mu, p, window=4096)
    sig = res.sig
    vops = mxu.build_verify_operators(kp.pk[0], p)
    sync(sig)

    report("verify_mxu (full)",
           timeit(jax.jit(lambda v, s, m: mxu.verify_mxu(v, s, m, p)), vops, sig, mu))

    report("unpack_sig",
           timeit(jax.jit(lambda s: pack.unpack_sig(s, p)), sig))
    report("  unpack_hints only",
           timeit(jax.jit(lambda s: pack.unpack_hints(s[..., 32 + p.L * p.polyz_packedbytes:], p)), sig))
    report("sample_in_ball",
           timeit(jax.jit(lambda s: sampling.sample_in_ball(s[..., :32], p)), sig))

    c_tilde, z, h, h_ok = jax.jit(lambda s: pack.unpack_sig(s, p))(sig)
    from dilithium_tpu.mxu import _apply_wy, _dot_i8, _mod_q_i32, _I8
    from dilithium_tpu.ops.reduce import center, sub_mod
    from dilithium_tpu.params import N

    zf = z.reshape(B, p.L * N)
    report("z -> Az (9 int8 matmuls)",
           timeit(jax.jit(lambda zz, w: _apply_wy(zz, w, p)), zf, vops.wz_limbs))

    c, _ = jax.jit(lambda s: sampling.sample_in_ball(s[..., :32], p))(sig)
    c_i8 = jax.jit(lambda cc: center(cc).astype(_I8))(c)

    def ct1_fn(ci, t1l):
        p0 = _dot_i8(ci, t1l[0])
        p1 = _dot_i8(ci, t1l[1])
        p2 = _dot_i8(ci, t1l[2])
        return _mod_q_i32(p0 + (p1 << 8) + (p2 << 16))

    report("c -> c.t1<<d (3 matmuls)",
           timeit(jax.jit(ct1_fn), c_i8, vops.t1_limbs))

    az = jax.jit(lambda zz, w: _apply_wy(zz, w, p))(zf, vops.wz_limbs)
    ct1 = jax.jit(ct1_fn)(c_i8, vops.t1_limbs)
    w = jax.jit(lambda a, c_: sub_mod(a, c_).reshape(B, p.K, N))(az, ct1)
    sync(w)

    report("verify tail (usehint+hash)",
           timeit(jax.jit(lambda w_, h_, ct, m, hk: scheme._verify_tail(w_, h_, ct, m, hk, p)),
                  w, h, c_tilde, mu, h_ok))

    report("  use_hint only",
           timeit(jax.jit(lambda h_, w_: rounding.use_hint(h_, w_, p)), h, w))
    w1 = jax.jit(lambda h_, w_: rounding.use_hint(h_, w_, p))(h, w)
    report("  pack_w1 only",
           timeit(jax.jit(lambda x: pack.pack_w1(x, p)), w1))
    w1p = jax.jit(lambda x: pack.pack_w1(x, p))(w1).reshape(B, p.K * p.polyw1_packedbytes)
    report("  c_tilde hash only",
           timeit(jax.jit(lambda m, wp: keccak.shake256(jnp.concatenate([m, wp], axis=-1), 32)),
                  mu, w1p))
    report("norm_exceeds(z)",
           timeit(jax.jit(lambda zz: rounding.norm_exceeds(zz, p.gamma1 - p.beta, axis=(-2, -1))), z))


if __name__ == "__main__":
    main()
