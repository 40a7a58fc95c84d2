"""Batched Keccak-f[1600] and SHAKE128/256 XOFs in pure jnp.

TPU-native replacement for the reference's VHDL Keccak core
(`rtl_src/keccak_top.vhd`, `keccak_round.vhd`, `keccak_fsm2.vhd:46-78` —
1 round/cycle, 24 cycles per permutation, shared by 3 instances). Here the
permutation is data-parallel: the batch dimension provides what the FPGA
got from pipelining, and all five scheme hash uses (seed expansion, tr, mu,
ExpandA/S/Mask streams, SampleInBall — see SURVEY.md §2.3 header-word list)
funnel through these functions.

Layout: 64-bit lanes are uint32 (lo, hi) pairs (the TPU VPU is a 32-bit
machine), held as a structure-of-arrays — 50 separate uint32 arrays whose
shape IS the batch, folded to [B/128, 128] so every VPU op runs on full
(8, 128) vector registers. The AoS alternative ([..., 25, 2] with the lane
index minor) puts the 2-element axis on the 128-lane dimension and runs at
~8% VPU utilization — measured 93 ns/state vs ~8 ns/state for this layout.
The permutation is fully unrolled: one XLA fusion, state resident in
vector registers across all 24 rounds, no HBM round-trips.

All shapes are static; variable-length absorb is handled by the caller
padding to a fixed byte length (pad10*1 indices are computed at trace
time), the device analog of the reference's header-word protocol
(`keccak_datapath.vhd:92-131`).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dilithium_tpu.params import SHAKE128_RATE, SHAKE256_RATE

_U32 = jnp.uint32

# Permutation backend for the shake hot path: "pallas" (Mosaic kernel,
# TPU only), "jnp" (XLA fusion, any backend), or "auto" (pallas on TPU).
_IMPL = os.environ.get("DILITHIUM_KECCAK_IMPL", "auto")


def _use_pallas() -> bool:
    if _IMPL == "pallas":
        return True
    if _IMPL == "jnp":
        return False
    return jax.default_backend() == "tpu"

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
_RC_LO = [np.uint32(c & 0xFFFFFFFF) for c in _RC64]
_RC_HI = [np.uint32(c >> 32) for c in _RC64]
_RC_LO_ARR = np.array(_RC_LO, dtype=np.uint32)
_RC_HI_ARR = np.array(_RC_HI, dtype=np.uint32)

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


def _round_soa(lo: List, hi: List, rc_lo, rc_hi) -> Tuple[List, List]:
    """One Keccak round (theta-rho-pi-chi-iota) on lists of lane planes.

    rho/pi and chi are interleaved per OUTPUT ROW: each chi output row is
    computed as soon as its five rho-rotated inputs are formed, instead of
    materializing the full 50-plane B state first. The smaller live set
    helps the register allocator in both the XLA-fused and Mosaic-kernel
    uses — measured 8% faster on the fused XOF Pallas kernel (v5e-1,
    B=16384, 5-block SHAKE256: 17.0-18.0 vs 18.9-19.6 ns/state/perm,
    interleaved A/B 2026-08-20; `tools/keccak_exp.py`).
    """
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

    # pi+chi per output row: B[bx + 5by] = rot(A[x + 5y]) with bx = y and
    # by = (2x + 3y) % 5, so for output row `by`: y = bx, x solves
    # (2x + 3y) % 5 == by  =>  x = 3*(by + 2*y) % 5
    out_lo: List = [None] * 25
    out_hi: List = [None] * 25
    for by in range(5):
        row_lo: List = [None] * 5
        row_hi: List = [None] * 5
        for bx in range(5):
            y = bx
            x = (3 * (by + 2 * y)) % 5
            rl, rh = _rotl64(lo[x + 5 * y], hi[x + 5 * y], _RHO[x][y])
            row_lo[bx] = rl
            row_hi[bx] = rh
        for bx in range(5):
            out_lo[bx + 5 * by] = row_lo[bx] ^ (~row_lo[(bx + 1) % 5] & row_lo[(bx + 2) % 5])
            out_hi[bx + 5 * by] = row_hi[bx] ^ (~row_hi[(bx + 1) % 5] & row_hi[(bx + 2) % 5])

    # iota
    out_lo[0] = out_lo[0] ^ rc_lo
    out_hi[0] = out_hi[0] ^ rc_hi
    return out_lo, out_hi


def _f1600_soa(lo: List[jnp.ndarray], hi: List[jnp.ndarray]) -> Tuple[List, List]:
    """Keccak-f[1600] on a structure-of-arrays state.

    lo/hi: 25 uint32 arrays each (lane k = x + 5*y, FIPS-202 order), any
    common shape. Fully unrolled — 24 rounds of pure elementwise ops that
    XLA fuses into one kernel.
    """
    lo = list(lo)
    hi = list(hi)
    for rnd in range(24):
        lo, hi = _round_soa(lo, hi, _RC_LO[rnd], _RC_HI[rnd])
    return lo, hi


def _f1600_soa_loop(lo: List[jnp.ndarray], hi: List[jnp.ndarray]) -> Tuple[List, List]:
    """Same permutation as `_f1600_soa`, as a fori_loop over a stacked carry.

    24x smaller traced graph — used on CPU, where XLA compile time of the
    fully-unrolled form dominates test latency and runtime fusion quality
    does not matter.
    """
    rc_lo = jnp.asarray(_RC_LO_ARR)
    rc_hi = jnp.asarray(_RC_HI_ARR)

    def body(rnd, st):
        lo = [st[k] for k in range(25)]
        hi = [st[25 + k] for k in range(25)]
        lo, hi = _round_soa(lo, hi, rc_lo[rnd], rc_hi[rnd])
        return jnp.stack(lo + hi)

    st = jax.lax.fori_loop(0, 24, body, jnp.stack(list(lo) + list(hi)))
    return [st[k] for k in range(25)], [st[25 + k] for k in range(25)]


def keccak_f1600(state: jnp.ndarray) -> jnp.ndarray:
    """Apply Keccak-f[1600] to a batch of states.

    state: uint32 array [..., 25, 2] with [..., k, 0] = low 32 bits of lane
    k and [..., k, 1] = high 32 bits; lane index k = x + 5*y (column-major,
    as in the FIPS-202 spec). Returns the permuted state, same shape.

    Public/testing API — the scheme's hot path goes through `shake`, which
    keeps the structure-of-arrays layout end to end.
    """
    lo = [state[..., k, 0] for k in range(25)]
    hi = [state[..., k, 1] for k in range(25)]
    f = _f1600_soa_loop if jax.default_backend() == "cpu" else _f1600_soa
    lo, hi = f(lo, hi)
    return jnp.stack(
        [jnp.stack([lo[k], hi[k]], axis=-1) for k in range(25)], axis=-2
    )


def _fold_batch(data: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...], int]:
    """[..., n] -> [ceil(B/128), 128, n]: batch on (sublane, lane) axes.

    Every per-lane slice of the folded array is a 2-D [B/128, 128] tile —
    full (8, 128) VPU register utilization (a flat [B] slice would occupy
    one sublane). Pads the batch; caller unfolds with `_unfold_batch`.
    """
    batch_shape = data.shape[:-1]
    n = data.shape[-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    flat = data.reshape((b, n))
    pad = (-b) % 128
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, n), dtype=data.dtype)], axis=0
        )
    return flat.reshape(((b + pad) // 128, 128, n)), batch_shape, b


def _unfold_batch(folded: jnp.ndarray, batch_shape: Tuple[int, ...], b: int) -> jnp.ndarray:
    n = folded.shape[-1]
    return folded.reshape((-1, n))[:b].reshape(batch_shape + (n,))


def _block_lanes(block: jnp.ndarray) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """uint8 [..., 8*w] -> (lo, hi): w pairs of uint32 [...] LE lanes."""
    w = block.shape[-1] // 8
    by = block.astype(_U32)
    lo, hi = [], []
    for k in range(w):
        o = 8 * k
        lo.append(
            by[..., o] | (by[..., o + 1] << 8) | (by[..., o + 2] << 16)
            | (by[..., o + 3] << 24)
        )
        hi.append(
            by[..., o + 4] | (by[..., o + 5] << 8) | (by[..., o + 6] << 16)
            | (by[..., o + 7] << 24)
        )
    return lo, hi


def _lanes_bytes(lo: Sequence[jnp.ndarray], hi: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """w uint32 lane pairs [...] -> uint8 [..., 8*w] little-endian."""
    parts = []
    for l, h in zip(lo, hi):
        for word in (l, h):
            parts.extend(
                ((word >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(jnp.uint8)
                for i in range(4)
            )
    return jnp.stack(parts, axis=-1)


def _absorb(data: jnp.ndarray, rate: int, domain: int = 0x1F):
    """Fold the batch, pad10*1, absorb all blocks. Returns the state as
    (lo, hi) plane lists plus the unfold metadata and the permute fn."""
    msg_len = data.shape[-1]
    nblocks_in = msg_len // rate + 1  # pad10*1 always appends at least 1 byte
    padded_len = nblocks_in * rate

    folded, batch_shape, b = _fold_batch(data.astype(jnp.uint8))

    # pad10*1: domain byte 0x1F (SHAKE) or 0x06 (SHA3 fixed-output modes)
    pad = jnp.zeros(folded.shape[:-1] + (padded_len - msg_len,), dtype=jnp.uint8)
    pad = pad.at[..., 0].set(domain)
    pad = pad.at[..., -1].set(pad[..., -1] | 0x80)
    padded = jnp.concatenate([folded, pad], axis=-1)

    if _use_pallas():
        from dilithium_tpu.ops import keccak_pallas
        permute = keccak_pallas.f1600_lists
    elif jax.default_backend() == "cpu":
        permute = _f1600_soa_loop  # compile-time-friendly
    else:
        permute = _f1600_soa

    rate_w = rate // 8
    zeros = jnp.zeros(folded.shape[:-1], dtype=_U32)
    lo = [zeros] * 25
    hi = [zeros] * 25
    for i in range(nblocks_in):
        blk_lo, blk_hi = _block_lanes(padded[..., i * rate: (i + 1) * rate])
        for k in range(rate_w):
            lo[k] = lo[k] ^ blk_lo[k]
            hi[k] = hi[k] ^ blk_hi[k]
        lo, hi = permute(lo, hi)
    return lo, hi, permute, batch_shape, b


def _shake_words_fused(
    data: jnp.ndarray, out_words: int, rate: int, domain: int = 0x1F
) -> jnp.ndarray:
    """Fused-kernel SHAKE: one pallas_call for absorb + all squeezes.

    Same contract as `shake_words`. The per-block plane packing (bytes ->
    lane words, pad10*1) stays in XLA — cheap elementwise prologue that
    fuses with the caller — while every Keccak permutation runs inside a
    single Mosaic kernel with the state resident in registers/VMEM.
    """
    from dilithium_tpu.ops import keccak_pallas

    msg_len = data.shape[-1]
    nblocks_in = msg_len // rate + 1
    padded_len = nblocks_in * rate

    folded, batch_shape, b = _fold_batch(data.astype(jnp.uint8))
    pad = jnp.zeros(folded.shape[:-1] + (padded_len - msg_len,), dtype=jnp.uint8)
    pad = pad.at[..., 0].set(domain)
    pad = pad.at[..., -1].set(pad[..., -1] | 0x80)
    padded = jnp.concatenate([folded, pad], axis=-1)

    rate_w = rate // 8
    # bytes -> little-endian u32 lane words in ONE bitcast (the byte-slice
    # packing of `_block_lanes` costs ~270 strided minor-axis u8 slices —
    # measured 10x the kernel itself). Word 2k / 2k+1 of block b land at
    # plane b*2*rate_w + 2k (+1): exactly the kernel's absorb layout.
    w32 = jax.lax.bitcast_convert_type(
        padded.reshape(padded.shape[:-1] + (padded_len // 4, 4)), jnp.uint32
    )  # [SB, 128, padded_len/4]
    stack = jnp.moveaxis(w32, -1, 0)  # [nblocks_in * 2*rate_w, SB, 128]
    out = keccak_pallas.shake_words_folded(stack, out_words, rate_w)
    return _unfold_batch(jnp.moveaxis(out, 0, -1), batch_shape, b)


def shake(data: jnp.ndarray, out_bytes: int, rate: int, domain: int = 0x1F) -> jnp.ndarray:
    """Sponge hash over a batch of fixed-length messages.

    data: uint8 [..., msg_len]; returns uint8 [..., out_bytes].
    rate: 168 for SHAKE128, 136 for SHAKE256 (domain 0x1F); the SHA3
    fixed-output modes use domain 0x06 (see `sha3_256` / `sha3_512`).
    """
    if _use_pallas():
        out_words = -(-out_bytes // 4)
        words = _shake_words_fused(data, out_words, rate, domain)
        by = (
            words[..., None] >> (jnp.arange(4, dtype=_U32) * 8)
        ).astype(jnp.uint8)
        return by.reshape(words.shape[:-1] + (out_words * 4,))[..., :out_bytes]
    lo, hi, permute, batch_shape, b = _absorb(data, rate, domain)
    rate_w = rate // 8
    nblocks_out = -(-out_bytes // rate)
    outs = []
    for i in range(nblocks_out):
        outs.append(_lanes_bytes(lo[:rate_w], hi[:rate_w]))
        if i + 1 < nblocks_out:
            lo, hi = permute(lo, hi)
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return _unfold_batch(out[..., :out_bytes], batch_shape, b)


def shake_words(data: jnp.ndarray, out_words: int, rate: int) -> jnp.ndarray:
    """SHAKE XOF squeezing uint32 words — no byte materialization.

    data: uint8 [..., msg_len]; returns uint32 [..., out_words] where word
    j holds output-stream bytes 4j..4j+3 little-endian (i.e. the uint32 LE
    view of the byte stream `shake` would produce). The samplers bit-slice
    coefficients straight from these words (`pack.unpack_bits_w`), which
    skips the 8-arrays-per-lane byte explosion of `_lanes_bytes` — the
    dominant cost of the byte API for long squeezes.
    """
    if _use_pallas():
        return _shake_words_fused(data, out_words, rate)
    lo, hi, permute, batch_shape, b = _absorb(data, rate)
    rate_w = rate // 8
    nblocks_out = -(-(out_words * 4) // rate)
    words: List[jnp.ndarray] = []
    for i in range(nblocks_out):
        for k in range(rate_w):
            words.append(lo[k])
            words.append(hi[k])
        if i + 1 < nblocks_out:
            lo, hi = permute(lo, hi)
    out = jnp.stack(words[:out_words], axis=-1)
    return _unfold_batch(out, batch_shape, b)


# Fixed-output SHA3 rates: rate = 200 - 2*digest_len (FIPS-202 §5.1).
# The reference Keccak core is a 4-mode engine — header bits 62:61 select
# SHA3-256 / SHA3-512 / SHAKE128 / SHAKE256 (`keccak_datapath.vhd:92-131`);
# Dilithium itself uses only the SHAKE modes, these two close the
# capability-parity gap of the subsystem.
SHA3_256_RATE = 136
SHA3_512_RATE = 72


def sha3_256(data: jnp.ndarray) -> jnp.ndarray:
    """SHA3-256 over a batch: uint8 [..., msg_len] -> uint8 [..., 32]."""
    return shake(data, 32, SHA3_256_RATE, domain=0x06)


def sha3_512(data: jnp.ndarray) -> jnp.ndarray:
    """SHA3-512 over a batch: uint8 [..., msg_len] -> uint8 [..., 64]."""
    return shake(data, 64, SHA3_512_RATE, domain=0x06)


def shake128(data: jnp.ndarray, out_bytes: int) -> jnp.ndarray:
    return shake(data, out_bytes, SHAKE128_RATE)


def shake256(data: jnp.ndarray, out_bytes: int) -> jnp.ndarray:
    return shake(data, out_bytes, SHAKE256_RATE)


def shake128_words(data: jnp.ndarray, out_words: int) -> jnp.ndarray:
    return shake_words(data, out_words, SHAKE128_RATE)


def shake256_words(data: jnp.ndarray, out_words: int) -> jnp.ndarray:
    return shake_words(data, out_words, SHAKE256_RATE)
