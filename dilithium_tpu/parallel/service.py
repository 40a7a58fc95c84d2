"""Sharded keygen / sign / verify — `shard_map` over the batch mesh.

Each device runs the full single-chip scheme (`dilithium_tpu.scheme`) on
its batch shard; the only collective is a `psum` of the throughput/attempt
counters (SURVEY.md §2.7: "no cross-chip math needed for correctness —
only a final psum for throughput accounting"). The rejection loop is
per-device: a chip whose shard finishes early simply exits its
`while_loop` sooner, which is the mesh-level analog of the FPGA's FSM1
pipelining hiding the variable attempt count (`combined_top.v:1823-2230`).

Keys may be sharded with the batch (axis 0 = distinct keys) or replicated
(one key, many messages) — both are expressed purely through in_shardings.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dilithium_tpu import scheme
from dilithium_tpu.params import DilithiumParams
from dilithium_tpu.parallel.mesh import BATCH_AXIS


class ShardedSignResult(NamedTuple):
    sig: jax.Array        # uint8 [B, sig_bytes], batch-sharded
    attempts: jax.Array   # int32 [B]
    ok: jax.Array         # bool [B]
    total_signed: jax.Array    # int32 scalar, global (psum)
    total_attempts: jax.Array  # int32 scalar, global (psum)


def sharded_keygen(mesh: Mesh, p: DilithiumParams):
    """Batched keygen over the mesh. seed uint8 [B, 32], B % n_devices == 0."""

    def kg(seed):
        kp = scheme.keygen(seed, p)
        return kp.pk, kp.sk, kp.ok

    mapped = shard_map(
        kg, mesh=mesh,
        in_specs=P(BATCH_AXIS, None),
        out_specs=(P(BATCH_AXIS, None), P(BATCH_AXIS, None), P(BATCH_AXIS)),
    )
    return jax.jit(mapped)


def sharded_sign(
    mesh: Mesh,
    p: DilithiumParams,
    attempts_per_round: int = 4,
    max_rounds: int = 64,
    replicate_key: bool = False,
):
    """Batched sign over the mesh.

    sk uint8 [B, sk_bytes] (or [sk_bytes] if replicate_key), mu [B, 64].
    Returns ShardedSignResult with psum'd global counters.
    """

    def sg(sk, mu):
        if replicate_key:
            sk = jnp.broadcast_to(sk, mu.shape[:1] + sk.shape)
        res = scheme.sign(sk, mu, p, attempts_per_round=attempts_per_round,
                          max_rounds=max_rounds)
        signed = jax.lax.psum(jnp.sum(res.ok.astype(jnp.int32)), BATCH_AXIS)
        att = jax.lax.psum(jnp.sum(res.attempts), BATCH_AXIS)
        return res.sig, res.attempts, res.ok, signed, att

    in_specs = (P() if replicate_key else P(BATCH_AXIS, None), P(BATCH_AXIS, None))
    mapped = shard_map(
        sg, mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(BATCH_AXIS, None), P(BATCH_AXIS), P(BATCH_AXIS), P(), P()),
    )

    def run(sk, mu) -> ShardedSignResult:
        return ShardedSignResult(*mapped(sk, mu))

    return jax.jit(run)


def sharded_sign_stream(
    mesh: Mesh,
    p: DilithiumParams,
    window: int = 768,
    max_rounds: int = 8192,
    use_mxu: bool = True,
):
    """One-key signing service over the mesh — the flagship serving path.

    The key's expansion is replicated (KeyOperators if use_mxu, else
    ExpandedKey); the message queue mu uint8 [Q, 64] is sharded on axis 0
    and each chip runs the elastic stream signer (`scheme.sign_stream` /
    `mxu.sign_stream_mxu`) on its local shard. Zero cross-chip traffic in
    the rejection loop — per-message kappa schedules make results
    bit-identical regardless of which chip signs which message — so
    scaling is linear up to queue granularity; `psum` totals are the only
    collective (SURVEY.md §2.7).

    Returns a jitted fn(key_material, mu) -> ShardedSignResult.
    """
    if use_mxu:
        from dilithium_tpu import mxu as _mxu

    def sg(km, mu):
        if use_mxu:
            res = _mxu.sign_stream_mxu(km, mu, p, window=window,
                                       max_rounds=max_rounds)
        else:
            res = scheme.sign_stream(km, mu, p, window=window,
                                     max_rounds=max_rounds)
        signed = jax.lax.psum(jnp.sum(res.ok.astype(jnp.int32)), BATCH_AXIS)
        att = jax.lax.psum(jnp.sum(res.attempts), BATCH_AXIS)
        return res.sig, res.attempts, res.ok, signed, att

    mapped = shard_map(
        sg, mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS, None)),
        out_specs=(P(BATCH_AXIS, None), P(BATCH_AXIS), P(BATCH_AXIS), P(), P()),
    )

    def run(km, mu) -> ShardedSignResult:
        return ShardedSignResult(*mapped(km, mu))

    return jax.jit(run)


def sharded_sign_stream_keys(
    mesh: Mesh,
    p: DilithiumParams,
    window: int = 768,
    max_rounds: int = 8192,
):
    """Independent-keys signing service over the mesh.

    The batched `ExpandedKey` (key axis) is REPLICATED — every chip holds
    all keys' NTT-domain material (~47 KB/key at level 3, so thousands of
    keys fit comfortably) — while key_idx [Q] and mu [Q, 64] shard on the
    queue axis; each chip runs `scheme.sign_stream_keys` on its local
    shard. Bit-identical per message regardless of sharding (per-message
    kappa schedules); psum totals are the only collective.

    Returns a jitted fn(eks, key_idx, mu) -> ShardedSignResult.
    """

    def sg(eks, key_idx, mu):
        res = scheme.sign_stream_keys(eks, key_idx, mu, p, window=window,
                                      max_rounds=max_rounds)
        signed = jax.lax.psum(jnp.sum(res.ok.astype(jnp.int32)), BATCH_AXIS)
        att = jax.lax.psum(jnp.sum(res.attempts), BATCH_AXIS)
        return res.sig, res.attempts, res.ok, signed, att

    mapped = shard_map(
        sg, mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS), P(BATCH_AXIS, None)),
        out_specs=(P(BATCH_AXIS, None), P(BATCH_AXIS), P(BATCH_AXIS), P(), P()),
    )

    def run(eks, key_idx, mu) -> ShardedSignResult:
        return ShardedSignResult(*mapped(eks, key_idx, mu))

    return jax.jit(run)


def sharded_verify(mesh: Mesh, p: DilithiumParams, replicate_key: bool = False):
    """Batched verify over the mesh. Returns (ok [B], total_ok scalar)."""

    def vy(pk, sig, mu):
        if replicate_key:
            # one key: expand once per shard, not once per lane
            epk = scheme.expand_pk(pk, p)
            ok = scheme.verify_expanded(epk, sig, mu, p)
        else:
            ok = scheme.verify(pk, sig, mu, p)
        total = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), BATCH_AXIS)
        return ok, total

    in_specs = (
        P() if replicate_key else P(BATCH_AXIS, None),
        P(BATCH_AXIS, None),
        P(BATCH_AXIS, None),
    )
    mapped = shard_map(
        vy, mesh=mesh, in_specs=in_specs, out_specs=(P(BATCH_AXIS), P()),
    )
    return jax.jit(mapped)


def sharded_verify_stream(mesh: Mesh, p: DilithiumParams, use_mxu: bool = True):
    """One-key verify service over the mesh — the verify serving path.

    The per-key expansion is replicated (VerifyOperators if use_mxu, else
    ExpandedPk) and computed ONCE by the caller (`mxu.build_verify_operators`
    / `scheme.expand_pk`); sig [B, sig_bytes] and mu [B, 64] are sharded on
    axis 0. Zero cross-chip traffic except the psum total.

    Returns a jitted fn(key_material, sig, mu) -> (ok [B], total scalar).
    """
    if use_mxu:
        from dilithium_tpu import mxu as _mxu

    def vy(km, sig, mu):
        if use_mxu:
            ok = _mxu.verify_mxu(km, sig, mu, p)
        else:
            ok = scheme.verify_expanded(km, sig, mu, p)
        total = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), BATCH_AXIS)
        return ok, total

    mapped = shard_map(
        vy, mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS, None), P(BATCH_AXIS, None)),
        out_specs=(P(BATCH_AXIS), P()),
    )
    return jax.jit(mapped)


def throughput_counters(result: ShardedSignResult) -> dict:
    """Host-side summary of the global psum counters."""
    return {
        "signed": int(result.total_signed),
        "attempts": int(result.total_attempts),
        "mean_attempts": float(result.total_attempts) / max(1, int(result.total_signed)),
    }
