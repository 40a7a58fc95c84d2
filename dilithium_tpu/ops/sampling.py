"""ExpandA / ExpandS / ExpandMask / SampleInBall — masked batch sampling.

TPU-native replacement for the reference's sampler pipeline
(`rtl_src/gen_a_ext.v`, `sampler_a_ext.v`, `rejection_a.v`, `gen_s.v`,
`sampler_s.v`, `rejection_s.v`, `expandmask_ext.v`, `sampler_y_ext.v`,
`rejection_y.v`, `gen_c.v`). The RTL streams SHAKE output through 3-lane
rejection filters, stalling until 256 coefficients are accepted; on TPU we
generate a fixed, provably sufficient number of XOF blocks for the whole
batch and compact accepted candidates with a cumulative-sum rank scatter —
the accepted sequence is identical to streaming semantics whenever the
budget suffices.

Fixed-budget failure bounds (per polynomial, Chernoff):
  ExpandA  : 6 SHAKE128 blocks = 336 candidates, p_accept = q/2^23 ≈ .99902
             P[<256 accepted] < 1e-60
  ExpandS  : eta=2: 2 SHAKE256 blocks = 544 cand, p=15/16 -> P[fail] < 1e-79
             eta=4: 3 blocks = 816 cand, p=9/16 -> P[fail] < 1e-53
  SampleInBall: 2 blocks = 272 bytes for 8 sign bytes + tau<=60 geometric
             draws at p >= 196/256 -> P[fail] < 1e-30
ExpandMask has no rejection (fixed 18/20-bit slices, `rejection_y.v:44-99`).
`*_ok` outputs report budget sufficiency so callers can assert/monitor.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dilithium_tpu.params import (
    Q, N, SHAKE128_RATE, SHAKE256_RATE, DilithiumParams,
)
from dilithium_tpu.ops import keccak
from dilithium_tpu.ops.pack import unpack_bits
from dilithium_tpu.ops.reduce import uncenter

_U8 = jnp.uint8
_U32 = jnp.uint32
_I32 = jnp.int32


def _le16(n: jnp.ndarray) -> jnp.ndarray:
    """uint32 [...] -> uint8 [..., 2] little-endian."""
    n = n.astype(_U32)
    return jnp.stack(
        [(n & 0xFF).astype(_U8), ((n >> 8) & 0xFF).astype(_U8)], axis=-1
    )


def _rank_compact(cand: jnp.ndarray, accept: jnp.ndarray, n_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact accepted candidates (in order) to the first n_out slots.

    cand, accept: [..., n_cand]. Returns ([..., n_out], ok[...]) where ok is
    False if fewer than n_out candidates were accepted (budget exhausted).
    """
    n_cand = cand.shape[-1]
    batch = cand.shape[:-1]
    acc = accept.astype(_U32)
    rank = jnp.cumsum(acc, axis=-1) - acc
    idx = jnp.where(accept, rank, jnp.uint32(n_out))  # overflow slot -> drop
    # vmap of a 1-D scatter: compiles to one batched scatter without
    # materializing batch-index constants (compile-time critical at B>1k)
    def scat(c, i):
        return jnp.zeros((n_out,), dtype=cand.dtype).at[i].set(c, mode="drop")
    flat = jax.vmap(scat)(cand.reshape((-1, n_cand)), idx.reshape((-1, n_cand)))
    out = flat.reshape(batch + (n_out,))
    ok = (rank[..., -1] + acc[..., -1]) >= n_out
    return out, ok


def expand_a(rho: jnp.ndarray, p: DilithiumParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ExpandA: rho uint8 [..., 32] -> (A_hat uint32 [..., K, L, 256], ok).

    A_hat is NTT-domain by definition. Nonce = (i << 8) + j, SHAKE128 over
    the 34-byte message rho||nonce16le (matches the RTL's 272-bit header,
    `sampler_a_ext.v:107`); candidates are 3-byte little-endian & 0x7FFFFF,
    accepted if < q (`rejection_a.v:67-91`).
    """
    batch = rho.shape[:-1]
    K, L = p.K, p.L
    nonces = jnp.asarray(
        [(i << 8) + j for i in range(K) for j in range(L)], dtype=_U32
    )
    msgs = jnp.concatenate(
        [
            jnp.broadcast_to(rho[..., None, :], batch + (K * L, 32)).astype(_U8),
            jnp.broadcast_to(_le16(nonces), batch + (K * L, 2)),
        ],
        axis=-1,
    )
    nbytes = p.uniform_blocks * SHAKE128_RATE
    stream = keccak.shake128(msgs, nbytes)  # [..., K*L, nbytes]
    ncand = nbytes // 3
    b = stream[..., : ncand * 3].reshape(batch + (K * L, ncand, 3)).astype(_U32)
    cand = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)) & jnp.uint32(0x7FFFFF)
    accept = cand < jnp.uint32(Q)
    out, ok = _rank_compact(cand, accept, N)
    return out.reshape(batch + (K, L, N)), jnp.all(ok, axis=-1)


def expand_s(
    sigma: jnp.ndarray, nonce_base: int, count: int, p: DilithiumParams
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ExpandS: sigma uint8 [..., 64] -> (polys uint32 [..., count, 256], ok).

    Samples `count` polynomials with nonces nonce_base..nonce_base+count-1
    (s1 uses 0..L-1, s2 uses L..L+K-1 — `gen_s.v:115-155`). Each byte gives
    two 4-bit candidates, low nibble first; eta=2 keeps t<15 -> 2-(t mod 5),
    eta=4 keeps t<9 -> 4-t (`rejection_s.v:85-133`). Output canonical [0,q).
    """
    batch = sigma.shape[:-1]
    nonces = jnp.arange(nonce_base, nonce_base + count, dtype=_U32)
    msgs = jnp.concatenate(
        [
            jnp.broadcast_to(sigma[..., None, :], batch + (count, 64)).astype(_U8),
            jnp.broadcast_to(_le16(nonces), batch + (count, 2)),
        ],
        axis=-1,
    )
    nbytes = p.eta_blocks * SHAKE256_RATE
    stream = keccak.shake256(msgs, nbytes).astype(_U32)
    nib = jnp.stack([stream & 0xF, stream >> 4], axis=-1).reshape(
        batch + (count, nbytes * 2)
    )
    if p.eta == 2:
        accept = nib < 15
        val = jnp.int32(2) - (nib % 5).astype(_I32)
    else:
        accept = nib < 9
        val = jnp.int32(4) - nib.astype(_I32)
    out, ok = _rank_compact(uncenter(val), accept, N)
    return out, jnp.all(ok, axis=-1)


def expand_mask(
    rhoprime: jnp.ndarray, kappa: jnp.ndarray, p: DilithiumParams
) -> jnp.ndarray:
    """ExpandMask: rhoprime uint8 [..., 64], kappa uint32 [...] ->
    y uint32 [..., L, 256] canonical, coefficients in [-gamma1+1, gamma1].

    Poly l uses nonce kappa + l (`expandmask_ext.v:287-293` — OFFSET += L
    per attempt lives in the caller's rejection loop). No rejection: fixed
    18/20-bit little-endian slices mapped to gamma1 - x (`rejection_y.v`).
    """
    batch = rhoprime.shape[:-1]
    L = p.L
    nonces = kappa[..., None].astype(_U32) + jnp.arange(L, dtype=_U32)
    msgs = jnp.concatenate(
        [
            jnp.broadcast_to(rhoprime[..., None, :], batch + (L, 64)).astype(_U8),
            _le16(nonces),
        ],
        axis=-1,
    )
    stream = keccak.shake256(msgs, p.polyz_packedbytes)
    r = unpack_bits(stream, p.gamma1_bits).astype(_I32)  # [..., L, 256]
    return uncenter(jnp.int32(p.gamma1) - r)


def sample_in_ball(
    c_tilde: jnp.ndarray, p: DilithiumParams
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SampleInBall: c_tilde uint8 [..., 32] -> (c uint32 [..., 256], ok).

    Fisher–Yates with tau swaps driven by a SHAKE256(c_tilde) byte stream:
    first 8 bytes are sign bits, then one byte per candidate position with
    rejection j > i (`gen_c.v:215-222, 330-343`). The sequential walk is a
    fixed-length `lax.scan` over the byte stream — O(tau) scalar work per
    signature against O(K*256) vector work elsewhere (SURVEY.md §2.4).
    Output coefficients are canonical {0, 1, q-1}.
    """
    batch = c_tilde.shape[:-1]
    nbytes = p.ball_blocks * SHAKE256_RATE
    stream = keccak.shake256(c_tilde, nbytes)  # [..., nbytes]
    sign_bytes = stream[..., :8].astype(_U32)
    sign_bits = (
        (sign_bytes[..., :, None] >> jnp.arange(8, dtype=_U32)) & 1
    ).reshape(batch + (64,))  # [..., 64], bit k = k-th sign
    bs = stream[..., 8:].astype(_I32)  # candidate position bytes
    nsteps = bs.shape[-1]

    def step(carry, byte):
        c, i, used = carry  # c [..., 256], i [...], used [...]
        active = (i < N) & (byte <= i)
        j = jnp.clip(byte, 0, N - 1)
        cj = jnp.take_along_axis(c, j[..., None].astype(_I32), axis=-1)[..., 0]
        sign_bit = jnp.take_along_axis(
            sign_bits, jnp.clip(used, 0, 63)[..., None], axis=-1
        )[..., 0]
        sval = jnp.where(sign_bit == 1, jnp.uint32(Q - 1), jnp.uint32(1))
        i_idx = jnp.clip(i, 0, N - 1)
        # c[i] = c[j]; c[j] = +-1   (order matters when i == j)
        new_ci = jnp.where(active, cj, jnp.take_along_axis(c, i_idx[..., None], axis=-1)[..., 0])
        c = _set_along_axis(c, i_idx, new_ci)
        cur_cj = jnp.take_along_axis(c, j[..., None].astype(_I32), axis=-1)[..., 0]
        c = _set_along_axis(c, j, jnp.where(active, sval, cur_cj))
        i = i + active.astype(_I32)
        used = used + active.astype(_I32)
        return (c, i, used), None

    # derive the zero carries from the stream so they inherit its varying
    # manual axes under shard_map (scan requires carry-in/out type equality)
    zero = (stream[..., 0] & jnp.uint8(0)).astype(_U32)  # [...], all zeros
    c0 = jnp.zeros(batch + (N,), dtype=_U32) + zero[..., None]
    i0 = jnp.full(batch, N - p.tau, dtype=_I32) + zero.astype(_I32)
    used0 = zero.astype(_I32)
    # scan over the byte-stream axis: move it to the front
    bs_t = jnp.moveaxis(bs, -1, 0)
    (c, i, _), _ = jax.lax.scan(step, (c0, i0, used0), bs_t)
    ok = i >= N  # all tau positions placed within the byte budget
    return c, ok


def _set_along_axis(c: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    """c[..., idx] = val with idx/val shaped like c's batch dims."""
    batch = c.shape[:-1]
    if len(batch) == 0:
        return c.at[idx].set(val)
    n = c.shape[-1]
    flat = jax.vmap(lambda row, i, v: row.at[i].set(v))(
        c.reshape((-1, n)), idx.reshape((-1,)), val.reshape((-1,))
    )
    return flat.reshape(c.shape)
