"""Component-level TPU microbenchmarks — where does sign time go?

Times each subsystem at a given batch size on the real chip, prints a
table to stderr and a JSON summary to stdout. Guides kernel work
(roofline notes mandated by SURVEY.md §5 tracing).

Usage: python bench_components.py [batch]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def sync(out):
    """Host scalar fetch — block_until_ready is unreliable on the tunnel."""
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
    from dilithium_tpu.ops import keccak, ntt, sampling, rounding, pack

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    p = params.get_params(3)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}, batch: {B}", file=sys.stderr)

    results = {}

    def report(name, secs, unit_count=1):
        per = secs / unit_count
        results[name] = {"ms": secs * 1e3, "per_unit_us": per * 1e6}
        print(f"{name:26s} {secs*1e3:9.2f} ms   ({per*1e6:8.2f} us/unit)", file=sys.stderr)

    # Keccak-f1600: B*30 states (the ExpandA-scale workload)
    st = jnp.asarray(rng.integers(0, 1 << 32, (B * 30, 25, 2), dtype=np.uint64).astype(np.uint32))
    f = jax.jit(keccak.keccak_f1600)
    report("keccak_f1600 x30B", timeit(f, st), B * 30)

    # SHAKE128 ExpandA-shape (34 B in, uniform_blocks out): B*KL messages
    msgs = jnp.asarray(rng.integers(0, 256, (B * p.K * p.L, 34), dtype=np.uint8))
    nbytes_a = p.uniform_blocks * 168
    f = jax.jit(lambda m: keccak.shake128(m, nbytes_a))
    report("shake128 expandA-shape", timeit(f, msgs, iters=3), B * p.K * p.L)

    # NTT forward: B*L polys
    x = jnp.asarray(rng.integers(0, params.Q, (B * p.L, 256), dtype=np.int64).astype(np.uint32))
    f = jax.jit(ntt.ntt)
    report("ntt fwd xBL", timeit(f, x), B * p.L)
    f = jax.jit(lambda a: ntt.invntt(a, from_product=True))
    report("invntt xBL", timeit(f, x), B * p.L)

    # matvec: [B,K,L,256] x [B,L,256]
    a = jnp.asarray(rng.integers(0, params.Q, (B, p.K, p.L, 256), dtype=np.int64).astype(np.uint32))
    s = jnp.asarray(rng.integers(0, params.Q, (B, p.L, 256), dtype=np.int64).astype(np.uint32))
    f = jax.jit(ntt.matvec)
    report("matvec", timeit(f, a, s), B)

    # expand_mask: B lanes
    rp = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))
    kap = jnp.zeros((B,), dtype=jnp.uint32)
    f = jax.jit(lambda r, k: sampling.expand_mask(r, k, p))
    report("expand_mask", timeit(f, rp, kap), B)

    # sample_in_ball: B lanes
    ct = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    f = jax.jit(lambda c: sampling.sample_in_ball(c, p))
    report("sample_in_ball", timeit(f, ct), B)

    # expand_a: per-key op — cap its batch (XLA materializes ~30 candidate
    # buffers; B=16k would need >HBM), report per-unit rate
    Ba = min(B, 2048)
    rho = jnp.asarray(rng.integers(0, 256, (Ba, 32), dtype=np.uint8))
    f = jax.jit(lambda r: sampling.expand_a(r, p))
    report("expand_a", timeit(f, rho, iters=3), Ba)

    # decompose + hints: [B, K, 256]
    w = jnp.asarray(rng.integers(0, params.Q, (B, p.K, 256), dtype=np.int64).astype(np.uint32))
    f = jax.jit(lambda w: rounding.decompose(w, p))
    report("decompose", timeit(f, w), B)

    # pack_sig-scale packing
    z = jnp.asarray(rng.integers(0, params.Q, (B, p.L, 256), dtype=np.int64).astype(np.uint32))
    f = jax.jit(lambda z: pack.pack_z(z, p))
    report("pack_z", timeit(f, z), B)

    # full single attempt (the while_loop body dominator) — one key
    # broadcast to B lanes (keygen at B=16k OOMs in ExpandA's candidate
    # buffers; the attempt cost is key-count independent)
    seed = jnp.asarray(rng.integers(0, 256, (Ba, 32), dtype=np.uint8))
    kp = scheme.keygen(seed[:1], p)
    ek = scheme.expand_sk(kp.sk, p)
    mu = jnp.asarray(rng.integers(0, 256, (B, 64), dtype=np.uint8))

    def bcast(x):
        return jnp.broadcast_to(x[0], (B,) + x.shape[1:])

    def one_attempt(a_hat, s1h, s2h, t0h, mu_, rp_, kap_):
        return scheme._sign_attempt(a_hat, s1h, s2h, t0h, mu_, rp_, kap_, p)

    f = jax.jit(one_attempt)
    report(
        "sign_attempt",
        timeit(f, bcast(ek.a_hat), bcast(ek.s1_hat), bcast(ek.s2_hat),
               bcast(ek.t0_hat), mu, rp, kap),
        B,
    )

    # dense-operator attempt (the MXU signer's while-body dominator)
    from dilithium_tpu import mxu
    ops_ = mxu.build_operators(kp.sk[0], p)
    f = jax.jit(lambda m, r, k: mxu._sign_attempt_mxu(ops_, m, r, k, p))
    report("sign_attempt_mxu", timeit(f, mu, rp, kap), B)

    # keygen: independent keypairs (per-key cost incl. ExpandA)
    f = jax.jit(lambda s: scheme.keygen(s, p).sk)
    report("keygen", timeit(f, seed, iters=3), Ba)

    # verify: one key, B signatures (service shape) — expanded-key paths
    # (scheme.verify would re-run ExpandA per LANE on a broadcast pk)
    res = scheme.sign(kp.sk, mu[:1], p)
    sig_b = jnp.broadcast_to(res.sig[0], (B,) + res.sig.shape[1:])
    epk = scheme.expand_pk(kp.pk[0], p)
    f = jax.jit(lambda e, s_, m_: scheme.verify_expanded(e, s_, m_, p))
    report("verify_expanded", timeit(f, epk, sig_b, mu), B)
    vops = mxu.build_verify_operators(kp.pk[0], p)
    f = jax.jit(lambda v, s_, m_: mxu.verify_mxu(v, s_, m_, p))
    report("verify_mxu", timeit(f, vops, sig_b, mu), B)

    # fresh-key verify: distinct pk per lane (includes per-lane ExpandA —
    # the path a CA-style workload hits; signatures don't match the keys,
    # which exercises identical compute, just ok=False)
    pk_many = scheme.keygen(seed, p).pk
    f = jax.jit(lambda pk_, s_, m_: scheme.verify(pk_, s_, m_, p))
    report("verify_fresh_keys", timeit(f, pk_many, sig_b[:Ba], mu[:Ba], iters=3), Ba)

    # --- single-op / small-batch WALL LATENCY (VERDICT r4 #7) ---
    # The reference testbenches print per-KAT cycle counts per operation
    # (`tb_keygen_top.v` S_STOP tail, `tb_sign_top.v` UNLOAD_C); these
    # rows are that latency view — wall time for ONE call at B=1 and
    # B=64, median of `lat_iters` calls (each call synced, so tunnel RTT
    # ~30 ms is part of the number a latency-sensitive caller would see;
    # the throughput rows above amortize it away). Disable with
    # DILITHIUM_BENCH_LATENCY=0 to skip the extra small-shape compiles.
    if os.environ.get("DILITHIUM_BENCH_LATENCY", "1") != "0":
        lat_iters = 21

        def lat(fn, *args):
            fn(*args)
            sync(fn(*args))  # compile + warm
            ts = []
            for _ in range(lat_iters):
                t0 = time.time()
                sync(fn(*args))
                ts.append(time.time() - t0)
            return sorted(ts)[lat_iters // 2]

        def report_lat(name, secs):
            results[name] = {"ms": secs * 1e3, "per_unit_us": secs * 1e6}
            print(f"{name:26s} {secs*1e3:9.2f} ms   (wall latency)",
                  file=sys.stderr)

        for Bl in (1, 64):
            seed_l = jnp.asarray(
                rng.integers(0, 256, (Bl, 32), dtype=np.uint8))
            mu_l = jnp.asarray(rng.integers(0, 256, (Bl, 64), dtype=np.uint8))
            f = jax.jit(lambda s_: scheme.keygen(s_, p).sk)
            report_lat(f"latency keygen B={Bl}", lat(f, seed_l))
            f = jax.jit(lambda m_: scheme.sign(
                kp.sk if Bl == 1 else jnp.broadcast_to(
                    kp.sk[0], (Bl,) + kp.sk.shape[1:]), m_, p).sig)
            report_lat(f"latency sign B={Bl}", lat(f, mu_l))
            sig_l = jnp.broadcast_to(res.sig[0], (Bl,) + res.sig.shape[1:])
            f = jax.jit(lambda s_, m_: scheme.verify_expanded(epk, s_, m_, p))
            report_lat(f"latency verify B={Bl}", lat(f, sig_l, mu_l))

    print(json.dumps({k: round(v["per_unit_us"], 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
