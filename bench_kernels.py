"""Kernel sweep: asymptotic throughput of the hot primitives at large batch.

Runs each primitive past the ~3 ms dispatch floor of the device tunnel so
the numbers reflect kernel quality, not launch overhead. Guides which
variant the scheme uses on TPU (e.g. jnp vs Pallas NTT).

Prints a table to stderr and a JSON summary to stdout.
Usage: python bench_kernels.py [n_states] [n_polys]
"""

import json
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

    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    n_polys = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}; {n_states} keccak states, {n_polys} ntt polys",
          file=sys.stderr)

    results = {}

    def report(name, secs, unit_count):
        per = secs / unit_count * 1e9
        results[name] = {"ms": secs * 1e3, "ns_per_unit": per}
        print(f"{name:34s} {secs*1e3:9.2f} ms   ({per:9.1f} ns/unit)",
              file=sys.stderr)

    from dilithium_tpu.ops import keccak as kmod

    st = jnp.asarray(
        rng.integers(0, 1 << 32, (n_states, 25, 2), dtype=np.uint64).astype(np.uint32)
    )
    f = jax.jit(kmod.keccak_f1600)
    report("keccak_f1600 (AoS api)", timeit(f, st, iters=5), n_states)

    # SoA fast path: state already folded [B/128, 128]
    lo = [jnp.asarray(rng.integers(0, 1 << 32, (n_states // 128, 128),
                                   dtype=np.uint64).astype(np.uint32))
          for _ in range(25)]
    hi = [jnp.asarray(rng.integers(0, 1 << 32, (n_states // 128, 128),
                                   dtype=np.uint64).astype(np.uint32))
          for _ in range(25)]

    def f1600_soa(lo, hi):
        return kmod._f1600_soa(lo, hi)

    f = jax.jit(f1600_soa)
    report("keccak_f1600 (SoA folded)", timeit(f, lo, hi, iters=5), n_states)

    if dev.platform != "cpu":
        from dilithium_tpu.ops import keccak_pallas
        state = jnp.stack(lo + hi)
        f = jax.jit(keccak_pallas.f1600_folded)
        report("keccak_f1600 (pallas)", timeit(f, state, iters=5), n_states)

    impls = ["jnp"] + ([] if dev.platform == "cpu" else ["pallas"])
    for impl in impls:
        kmod._IMPL = impl
        # full shake128 ExpandA-shape (34 B in, 1008 B out)
        msgs = jnp.asarray(rng.integers(0, 256, (n_states // 8, 34), dtype=np.uint8))
        f = jax.jit(lambda m: kmod.shake128(m, 6 * 168))
        report(f"shake128 34B->1008B {impl}", timeit(f, msgs, iters=3), n_states // 8)

        # shake256 ExpandMask-shape (66 B in, 640 B out)
        msgs = jnp.asarray(rng.integers(0, 256, (n_states // 8, 66), dtype=np.uint8))
        f = jax.jit(lambda m: kmod.shake256(m, 640))
        report(f"shake256 66B->640B {impl}", timeit(f, msgs, iters=3), n_states // 8)
    kmod._IMPL = "auto"

    from dilithium_tpu import params
    from dilithium_tpu.ops import ntt as ntt_jnp
    from dilithium_tpu.ops import ntt_pallas

    x = jnp.asarray(
        rng.integers(0, params.Q, (n_polys, 256), dtype=np.int64).astype(np.uint32)
    )
    ntt_jnp._IMPL = "jnp"
    f = jax.jit(ntt_jnp.ntt)
    report("ntt fwd jnp", timeit(f, x, iters=5), n_polys)
    f = jax.jit(lambda a: ntt_jnp.invntt(a, from_product=True))
    report("invntt jnp", timeit(f, x, iters=5), n_polys)
    ntt_jnp._IMPL = "auto"
    if dev.platform != "cpu":
        f = jax.jit(ntt_pallas.ntt)
        report("ntt fwd pallas", timeit(f, x, iters=5), n_polys)
        f = jax.jit(lambda a: ntt_pallas.invntt(a, from_product=True))
        report("invntt pallas", timeit(f, x, iters=5), n_polys)

    print(json.dumps({k: round(v["ns_per_unit"], 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
