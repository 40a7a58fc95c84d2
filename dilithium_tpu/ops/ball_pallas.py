"""Pallas TPU kernel for SampleInBall — walk + swaps in one kernel.

The jnp path (`ops/sampling.py:sample_in_ball`) runs the 264-byte
acceptance walk as a chunked state-map composition (17 dependent gathers
= 17 serialized XLA kernels) and the tau swap steps as one-hot selects
over HBM-materialized [B, 256] arrays; measured ~1.9 us/msg at B=4096 —
the single most expensive stage of a sign attempt. This kernel does the
whole thing in one Mosaic invocation per 128 messages:

  layout: messages on the 128-lane axis. The SHAKE byte stream arrives
  as uint32 words [68, 128] (9 vregs), the accepted-position buffer is
  [64, 128] (8 vregs, position t in sublane-packed row t), and the
  challenge poly c is [256, 128] (32 vregs, coefficient r at vreg r//8
  sublane r%8). Everything is register/VMEM resident; the sequential
  structure (264 walk steps + tau swap steps) is fully unrolled with all
  word/row indices static.

This is the TPU analog of the reference's `gen_c.v:215-343`: the RTL
keeps the poly as an in-register 256x2-bit array and consumes one byte
per cycle; here each unrolled step consumes one byte for 128 messages at
once.

Byte semantics (`gen_c.v`, pq-crystals poly_challenge): first 8 stream
bytes are the 64 sign bits (little-endian); each later byte b is a
candidate position for Fisher-Yates step i = N - tau + cnt, accepted iff
b <= i; on accept: c[i] = c[b]; c[b] = +-1 by sign bit cnt.
Bit-exactness vs the jnp path is pinned by tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dilithium_tpu.params import Q, N

_U32 = jnp.uint32
_I32 = jnp.int32


def _kernel(w_ref, c_ref, ok_ref, *, tau, nbytes):
    def word(i):
        return w_ref[i:i + 1, :].astype(_U32)  # (1, 128)

    sign_lo = word(0)
    sign_hi = word(1)

    # Phase 1 — acceptance walk: collect the first tau accepted bytes.
    cnt = jnp.zeros((1, 128), _I32)
    jrow = jax.lax.broadcasted_iota(_I32, (64, 128), 0)
    j_buf = jnp.zeros((64, 128), _I32)
    for t in range(8, nbytes):
        byte = ((word(t // 4) >> _U32(8 * (t % 4))) & _U32(0xFF)).astype(_I32)
        take = (byte <= (N - tau) + cnt) & (cnt < tau)  # (1, 128)
        j_buf = jnp.where((jrow == cnt) & take, byte, j_buf)
        cnt = cnt + take.astype(_I32)
    ok_ref[0:1, :] = (cnt >= tau).astype(_U32)

    # Phase 2 — tau Fisher-Yates swap steps; i_t = N - tau + t is static.
    rows = jax.lax.broadcasted_iota(_I32, (256, 128), 0)
    c = jnp.zeros((256, 128), _U32)
    for t in range(tau):
        j = j_buf[t:t + 1, :]  # (1, 128)
        bit = ((sign_lo >> _U32(t)) if t < 32 else (sign_hi >> _U32(t - 32))) & _U32(1)
        sval = jnp.where(bit == 1, _U32(Q - 1), _U32(1))  # (1, 128)
        onehot_j = rows == j  # (256, 128)
        # int32 reduce: Mosaic has no unsigned reductions; values < 2^23 fit
        cj = jnp.sum(
            jnp.where(onehot_j, c.astype(_I32), 0), axis=0, keepdims=True
        ).astype(_U32)
        c = jnp.where(rows == (N - tau + t), cj, c)  # c[i] = c[j]
        c = jnp.where(onehot_j, sval, c)             # c[j] = +-1 (after c[i])
    c_ref[...] = c


def sample_in_ball_words(
    words: jnp.ndarray, tau: int, nbytes: int, *, interpret: bool = False
):
    """words: uint32 [..., nbytes/4] SHAKE256(c_tilde) stream words.

    Returns (c uint32 [..., 256] canonical {0, 1, q-1}, ok bool [...]).
    """
    batch = words.shape[:-1]
    nw = words.shape[-1]
    assert nw * 4 == nbytes
    flat = words.reshape((-1, nw)).astype(_U32)
    b = flat.shape[0]
    pad = (-b) % 128
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, nw), dtype=_U32)], axis=0
        )
    bp = b + pad
    xt = flat.T  # [nw, B']
    kernel = functools.partial(_kernel, tau=tau, nbytes=nbytes)
    c, ok = pl.pallas_call(
        kernel,
        grid=(bp // 128,),
        in_specs=[
            pl.BlockSpec((nw, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((256, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((256, bp), _U32),
            jax.ShapeDtypeStruct((1, bp), _U32),
        ],
        interpret=interpret,
    )(xt)
    c = c.T[:b].reshape(batch + (N,))
    ok = (ok[0, :b] > 0).reshape(batch)
    return c, ok
