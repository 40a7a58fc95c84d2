"""Batched Keccak-f[1600] and SHAKE128/256 XOFs in pure jnp.

TPU-native replacement for the reference's VHDL Keccak core
(`rtl_src/keccak_top.vhd`, `keccak_round.vhd`, `keccak_fsm2.vhd:46-78` —
1 round/cycle, 24 cycles per permutation, shared by 3 instances). Here the
permutation is data-parallel: the batch dimension provides what the FPGA
got from pipelining, and all five scheme hash uses (seed expansion, tr, mu,
ExpandA/S/Mask streams, SampleInBall — see SURVEY.md §2.3 header-word list)
funnel through these functions.

64-bit lanes are represented as uint32 (lo, hi) pairs, since the TPU VPU is
a 32-bit machine. All shapes are static; variable-length absorb is handled
by the caller padding to a fixed byte length (pad10*1 indices are computed
at trace time).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dilithium_tpu.params import SHAKE128_RATE, SHAKE256_RATE

_U32 = jnp.uint32

# Keccak round constants, split into (lo32, hi32)
_RC64 = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC_LO = np.array([c & 0xFFFFFFFF for c in _RC64], dtype=np.uint32)
_RC_HI = np.array([c >> 32 for c in _RC64], dtype=np.uint32)

# rho rotation offsets, indexed [x][y] (lane (x, y), x = column)
_RHO = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rotl64(lo: jnp.ndarray, hi: jnp.ndarray, r: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate a 64-bit lane (as uint32 lo/hi) left by static amount r."""
    r = r % 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r > 32:
        lo, hi = hi, lo
        r -= 32
    s = jnp.uint32(r)
    t = jnp.uint32(32 - r)
    return (lo << s) | (hi >> t), (hi << s) | (lo >> t)


def keccak_f1600(state: jnp.ndarray) -> jnp.ndarray:
    """Apply Keccak-f[1600] to a batch of states.

    state: uint32 array [..., 25, 2] with [..., k, 0] = low 32 bits of lane
    k and [..., k, 1] = high 32 bits; lane index k = x + 5*y (column-major,
    as in the FIPS-202 spec). Returns the permuted state, same shape.
    """
    rc_lo = jnp.asarray(_RC_LO)
    rc_hi = jnp.asarray(_RC_HI)

    def round_body(rnd, st):
        lo = [st[..., k, 0] for k in range(25)]
        hi = [st[..., k, 1] for k in range(25)]

        # theta
        c_lo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20] for x in range(5)]
        c_hi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20] for x in range(5)]
        for x in range(5):
            r_lo, r_hi = _rotl64(c_lo[(x + 1) % 5], c_hi[(x + 1) % 5], 1)
            d_lo = c_lo[(x + 4) % 5] ^ r_lo
            d_hi = c_hi[(x + 4) % 5] ^ r_hi
            for y in range(5):
                lo[x + 5 * y] = lo[x + 5 * y] ^ d_lo
                hi[x + 5 * y] = hi[x + 5 * y] ^ d_hi

        # rho + pi: B[y][(2x+3y)%5] = rotl(A[x][y], rho[x][y])
        b_lo: List = [None] * 25
        b_hi: List = [None] * 25
        for x in range(5):
            for y in range(5):
                bx, by = y, (2 * x + 3 * y) % 5
                rl, rh = _rotl64(lo[x + 5 * y], hi[x + 5 * y], _RHO[x][y])
                b_lo[bx + 5 * by] = rl
                b_hi[bx + 5 * by] = rh

        # chi
        for y in range(5):
            row_lo = [b_lo[x + 5 * y] for x in range(5)]
            row_hi = [b_hi[x + 5 * y] for x in range(5)]
            for x in range(5):
                lo[x + 5 * y] = row_lo[x] ^ (~row_lo[(x + 1) % 5] & row_lo[(x + 2) % 5])
                hi[x + 5 * y] = row_hi[x] ^ (~row_hi[(x + 1) % 5] & row_hi[(x + 2) % 5])

        # iota
        lo[0] = lo[0] ^ rc_lo[rnd]
        hi[0] = hi[0] ^ rc_hi[rnd]

        return jnp.stack(
            [jnp.stack([lo[k], hi[k]], axis=-1) for k in range(25)], axis=-2
        )

    return jax.lax.fori_loop(0, 24, round_body, state, unroll=4)


def _bytes_to_lanes(block: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., 8*w] -> uint32 [..., w, 2] little-endian lanes."""
    w = block.shape[-1] // 8
    b = block.reshape(block.shape[:-1] + (w, 2, 4)).astype(_U32)
    word = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    return word  # [..., w, 2] with [...,0]=lo, [...,1]=hi


def _lanes_to_bytes(lanes: jnp.ndarray) -> jnp.ndarray:
    """uint32 [..., w, 2] -> uint8 [..., 8*w] little-endian."""
    w = lanes.shape[-2]
    out = jnp.stack(
        [(lanes >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(4)], axis=-1
    )  # [..., w, 2, 4]
    return out.astype(jnp.uint8).reshape(lanes.shape[:-2] + (8 * w,))


def shake(data: jnp.ndarray, out_bytes: int, rate: int) -> jnp.ndarray:
    """SHAKE XOF over a batch of fixed-length messages.

    data: uint8 [..., msg_len]; returns uint8 [..., out_bytes].
    rate: 168 for SHAKE128, 136 for SHAKE256. Static shapes only — this is
    the device analog of the reference's header-word driven Keccak FIFO
    protocol (`keccak_datapath.vhd:92-131`).
    """
    msg_len = data.shape[-1]
    batch_shape = data.shape[:-1]
    nblocks_in = msg_len // rate + 1  # pad10*1 always appends at least 1 byte
    padded_len = nblocks_in * rate

    # pad10*1 with SHAKE domain byte 0x1F
    pad = jnp.zeros(batch_shape + (padded_len - msg_len,), dtype=jnp.uint8)
    pad = pad.at[..., 0].set(0x1F)
    pad = pad.at[..., -1].set(pad[..., -1] | 0x80)
    padded = jnp.concatenate([data.astype(jnp.uint8), pad], axis=-1)

    # absorb
    state = jnp.zeros(batch_shape + (25, 2), dtype=_U32)
    rate_w = rate // 8
    for i in range(nblocks_in):
        block = padded[..., i * rate: (i + 1) * rate]
        lanes = _bytes_to_lanes(block)
        state = state.at[..., :rate_w, :].set(state[..., :rate_w, :] ^ lanes)
        state = keccak_f1600(state)

    # squeeze
    nblocks_out = -(-out_bytes // rate)
    outs = []
    for i in range(nblocks_out):
        outs.append(_lanes_to_bytes(state[..., :rate_w, :]))
        if i + 1 < nblocks_out:
            state = keccak_f1600(state)
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return out[..., :out_bytes]


def shake128(data: jnp.ndarray, out_bytes: int) -> jnp.ndarray:
    return shake(data, out_bytes, SHAKE128_RATE)


def shake256(data: jnp.ndarray, out_bytes: int) -> jnp.ndarray:
    return shake(data, out_bytes, SHAKE256_RATE)
