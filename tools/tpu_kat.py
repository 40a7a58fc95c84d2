"""On-device byte-exact KAT replay gate — run on the REAL TPU backend.

The unit/KAT test suite pins byte-exactness on the CPU backend
(tests/conftest.py forces cpu); this tool closes the artifact-level gap the
reference testbenches cover (`rtl_tb/tb_sign_top.v:147-283`,
`tb_keygen_top.v:136-280` replay KATs against the synthesized core, not a
model of it): it runs keygen + BOTH signers + verify on whatever backend
`jax.devices()` resolves to (the tunneled TPU chip under the driver) and
byte-compares every output against `/root/reference/KAT`.

Per level 2/3/5:
  * keygen(seed) for COUNT KAT seeds — compare rho/K/tr and the packed
    s1/s2/t0/t1 encodings byte-for-byte;
  * `scheme.sign` (lockstep batch signer) over all COUNT messages —
    compare c~ / z / h signature bytes;
  * `mxu.sign_stream_mxu` (elastic-scheduler MXU signer, the bench path)
    under KAT key 0, a queue of STREAM_Q copies of its message — every
    queue row must equal KAT signature 0 (deterministic signing);
  * `scheme.verify` accepts the KAT signatures and rejects a corrupted one.

Prints one JSON line to stdout ({"kat_tpu": "ok"|"FAIL", ...}); detail to
stderr. Exit code 0 iff everything matched. Run next to bench.py every
round; record the JSON as KAT_TPU_r{N}.json.

Env: DILITHIUM_TPU_KAT_COUNT (default 25 vectors/level),
DILITHIUM_TPU_KAT_STREAM_Q (default 128 queue rows for the stream signer
— W = 128 auto-enables the fused-mask limb kernel, so the gate checks
the production kernel path).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def init_backend(retries=3, delay=20.0):
    """jax.devices() with bounded retry; on persistent outage emit one
    parseable JSON line and exit nonzero instead of a raw traceback
    (same hardening as bench.py, VERDICT r4 #2)."""
    last = None
    for i in range(retries):
        try:
            return jax.devices()[0]
        except Exception as e:
            last = e
            log(f"backend init attempt {i + 1}/{retries} failed: {e}")
            if i + 1 < retries:
                time.sleep(delay)
    print(json.dumps({
        "kat_tpu": "ERROR",
        "error": "backend_unavailable",
        "detail": str(last)[:200],
    }))
    sys.exit(1)


def main() -> int:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from dilithium_tpu import mxu, params, scheme
    from dilithium_tpu.ops import pack
    from dilithium_tpu.utils import kat

    count = int(os.environ.get("DILITHIUM_TPU_KAT_COUNT", "25"))
    # 128 queue rows -> W = 128: the MXU stream signer's fused-mask limb
    # kernel auto-enables at W % 128 == 0, so the gate byte-checks the
    # kernel path (not the jnp fallback) on the real chip
    stream_q = int(os.environ.get("DILITHIUM_TPU_KAT_STREAM_Q", "128"))
    dev = init_backend()
    backend = dev.platform
    log(f"device: {dev} ({backend}), {count} vectors/level, "
        f"stream queue {stream_q}")

    results = {}
    failures = []

    def check(level, name, got, exp):
        got = np.asarray(got)
        exp = np.asarray(exp)
        ok = got.shape == exp.shape and np.array_equal(got, exp)
        results[f"L{level}.{name}"] = bool(ok)
        if not ok:
            failures.append(f"L{level}.{name}")
            n_bad = int((got != exp).sum()) if got.shape == exp.shape else -1
            log(f"  MISMATCH L{level}.{name}: shapes {got.shape} vs "
                f"{exp.shape}, {n_bad} differing bytes")
        return ok

    for level in (2, 3, 5):
        p = params.get_params(level)
        k = kat.load_kat(level, count=count)
        t0 = time.time()

        # --- keygen ---
        seed = jnp.asarray(kat.stack_u8(k["z"]))
        kp = scheme.keygen(seed, p)
        check(level, "keygen.rho", kp.rho, kat.stack_u8(k["rho"]))
        check(level, "keygen.key", kp.key, kat.stack_u8(k["k"]))
        check(level, "keygen.tr", kp.tr, kat.stack_u8(k["tr"]))
        check(level, "keygen.s1",
              np.asarray(pack.pack_eta(kp.s1, p)).reshape(count, -1),
              kat.stack_u8(k["s1"]))
        check(level, "keygen.s2",
              np.asarray(pack.pack_eta(kp.s2, p)).reshape(count, -1),
              kat.stack_u8(k["s2"]))
        check(level, "keygen.t0",
              np.asarray(pack.pack_t0(kp.t0)).reshape(count, -1),
              kat.stack_u8(k["t0"]))
        check(level, "keygen.t1",
              np.asarray(pack.pack_t1(kp.t1)).reshape(count, -1),
              kat.stack_u8(k["t1"]))
        log(f"L{level} keygen checked in {time.time() - t0:.1f}s")

        # --- lockstep batch signer ---
        t0 = time.time()
        mus = jnp.asarray(np.stack(
            [kat.to_u8(kat.crh(tr, m)) for tr, m in zip(k["tr"], k["m"])]
        ))
        res = scheme.sign(kp.sk, mus, p)
        sig = np.asarray(res.sig)
        nz = p.L * p.polyz_packedbytes
        all_ok = bool(np.asarray(res.ok).all())
        results[f"L{level}.sign.ok"] = all_ok
        if not all_ok:
            failures.append(f"L{level}.sign.ok")
        check(level, "sign.c", sig[:, :32], kat.stack_u8(k["c"]))
        check(level, "sign.z", sig[:, 32:32 + nz], kat.stack_u8(k["zs"]))
        check(level, "sign.h", sig[:, 32 + nz:], kat.stack_u8(k["h"]))
        log(f"L{level} lockstep sign checked in {time.time() - t0:.1f}s")

        # --- MXU elastic stream signer (the bench path), KAT key 0 ---
        t0 = time.time()
        ops = mxu.build_operators(kp.sk[0], p)
        mu_q = jnp.broadcast_to(mus[0], (stream_q,) + mus[0].shape)
        sres = mxu.sign_stream_mxu(
            ops, mu_q, p, window=min(768, stream_q), max_rounds=4096
        )
        s_ok = bool(np.asarray(sres.ok).all())
        results[f"L{level}.stream_mxu.ok"] = s_ok
        if not s_ok:
            failures.append(f"L{level}.stream_mxu.ok")
        exp_sig = np.concatenate(
            [kat.to_u8(k["c"][0]), kat.to_u8(k["zs"][0]), kat.to_u8(k["h"][0])]
        )
        check(level, "stream_mxu.sig", np.asarray(sres.sig),
              np.broadcast_to(exp_sig, (stream_q, exp_sig.shape[0])))
        log(f"L{level} MXU stream sign checked in {time.time() - t0:.1f}s")

        # --- independent-keys elastic signer: first 4 KAT keys, each
        # signing its own message, mixed in one window ---
        t0 = time.time()
        nk = min(4, count)
        eks = scheme.expand_sk(kp.sk[:nk], p)
        key_idx = jnp.arange(nk, dtype=jnp.int32)
        kres = scheme.sign_stream_keys(
            eks, key_idx, mus[:nk], p, window=nk, max_rounds=4096
        )
        k_ok = bool(np.asarray(kres.ok).all())
        results[f"L{level}.stream_keys.ok"] = k_ok
        if not k_ok:
            failures.append(f"L{level}.stream_keys.ok")
        exp_sigs = np.concatenate(
            [kat.stack_u8(k["c"])[:nk], kat.stack_u8(k["zs"])[:nk],
             kat.stack_u8(k["h"])[:nk]], axis=1,
        )
        check(level, "stream_keys.sig", np.asarray(kres.sig), exp_sigs)
        log(f"L{level} independent-keys stream checked in {time.time() - t0:.1f}s")

        # --- verify: KAT signatures accept, a corrupted byte rejects ---
        t0 = time.time()
        sigs = jnp.asarray(np.concatenate(
            [kat.stack_u8(k["c"]), kat.stack_u8(k["zs"]), kat.stack_u8(k["h"])],
            axis=1,
        ))
        ok = np.asarray(scheme.verify(kp.pk, sigs, mus, p))
        results[f"L{level}.verify.accept"] = bool(ok.all())
        if not ok.all():
            failures.append(f"L{level}.verify.accept")
        bad = sigs.at[:, 40].set(sigs[:, 40] ^ jnp.uint8(1))
        ok_bad = np.asarray(scheme.verify(kp.pk, bad, mus, p))
        results[f"L{level}.verify.reject_corrupted"] = bool(~ok_bad.any())
        if ok_bad.any():
            failures.append(f"L{level}.verify.reject_corrupted")
        log(f"L{level} verify checked in {time.time() - t0:.1f}s")

    status = "ok" if not failures else "FAIL"
    print(json.dumps({
        "kat_tpu": status,
        "backend": backend,
        "vectors_per_level": count,
        "stream_queue": stream_q,
        "checks": len(results),
        "failed": failures,
    }))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
