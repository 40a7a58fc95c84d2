"""Scaling-efficiency benchmark: batched one-key signing over the mesh.

BASELINE.md north-star: >= 95% linear batched-sign throughput scaling from
1 chip to v5e-16. The workload is embarrassingly parallel (zero cross-chip
traffic except the psum counter, `parallel/service.py`), so the efficiency
loss to measure is dispatch/psum overhead, not communication.

Method: run the one-key MXU stream signer (a) unsharded on device 0 with a
per-device batch B, (b) sharded over all N visible devices with batch N*B
(weak scaling), and report efficiency = (sharded_rate / N) / single_rate.

Prints ONE JSON line. On this CI host only one real TPU chip is visible
(N=1, efficiency trivially ~1.0 — the run still validates the sharded
dispatch path end to end); on a pod slice the same script measures the
real curve. For a functional N=8 check without hardware, run with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
(throughput numbers are then meaningless but efficiency is still the
sharding overhead ratio).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.sum(jnp.ravel(leaf)[:8].astype(jnp.uint32)))


def main():
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    from dilithium_tpu import mxu, params, scheme
    from dilithium_tpu.parallel import make_mesh, sharded_sign_stream
    from dilithium_tpu.parallel.mesh import batch_sharding

    level = int(os.environ.get("DILITHIUM_BENCH_LEVEL", "3"))
    per_dev = int(os.environ.get("DILITHIUM_BENCH_BATCH", "16384"))
    iters = int(os.environ.get("DILITHIUM_BENCH_ITERS", "10"))
    window = int(os.environ.get("DILITHIUM_BENCH_WINDOW", "768"))
    p = params.get_params(level)

    devices = jax.devices()
    n = len(devices)
    log(f"{n} device(s): {devices[0].platform}")

    rng = np.random.default_rng(0)
    seed = jnp.asarray(rng.integers(0, 256, size=(32,), dtype=np.uint8))
    kp = scheme.keygen(seed, p)
    ops = mxu.build_operators(kp.sk, p)
    sync(ops.wy_limbs)

    def timed(run, mu, label):
        sig = run(mu)
        sync(sig)
        t0 = time.time()
        for _ in range(iters):
            sig = run(mu)
        sync(sig)
        dt = time.time() - t0
        rate = mu.shape[0] * iters / dt
        log(f"{label}: {rate:,.0f} signs/sec ({dt:.2f}s)")
        return rate

    # single device
    mu1 = jax.device_put(
        rng.integers(0, 256, size=(per_dev, 64), dtype=np.uint8), devices[0]
    )
    single = timed(
        lambda m: mxu.sign_stream_mxu(ops, m, p, window=window, max_rounds=8192).sig,
        mu1, "single-device",
    )

    # weak-scaled over the mesh
    mesh = make_mesh(devices)
    svc = sharded_sign_stream(mesh, p, window=window, use_mxu=True)
    mu_n = jax.device_put(
        rng.integers(0, 256, size=(per_dev * n, 64), dtype=np.uint8),
        batch_sharding(mesh),
    )
    sharded = timed(lambda m: svc(ops, m).sig, mu_n, f"{n}-device mesh")

    eff = (sharded / n) / single
    print(json.dumps({
        "metric": f"dilithium{level}_sign_scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"fraction_of_linear_x{n}",
        "vs_baseline": round(eff / 0.95, 3),
    }))


if __name__ == "__main__":
    main()
