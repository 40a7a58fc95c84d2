"""Pallas TPU kernel for batched Keccak-f[1600] on the folded SoA layout.

The jnp path (`ops/keccak.py`) expresses the permutation as ~8400
elementwise uint32 ops per state and relies on XLA to fuse them; measured
~57 ns/state on v5e — several times off the VPU issue-rate roofline,
because XLA materializes parts of the 24-round chain to VMEM. This kernel
hands Mosaic the whole permutation with the 50 lane-half planes resident
as (8, 128) vector registers: one grid step processes 1024 states (8
sublanes x 128 lanes), all 24 rounds unrolled, a single HBM read + write
per plane.

This is the TPU analog of the reference's 1-round/cycle iterative core
(`keccak_fsm2.vhd:46-78`): where the FPGA owns a 1600-bit register and
wires theta-rho-pi-chi-iota combinationally, each Pallas program owns
1024 x 1600 bits of state striped over vector registers.

State layout: uint32 [50, SB, 128]; row k < 25 = low half of lane k, row
25 + k = high half (lane k = x + 5y as in FIPS-202). Bit-exactness vs the
jnp path is pinned by tests/test_keccak.py (interpret mode on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dilithium_tpu.ops import keccak as _kref

_TILE = 8  # sublanes per grid step -> 1024 states/program


def _kernel(in_ref, out_ref):
    lo = [in_ref[k] for k in range(25)]
    hi = [in_ref[25 + k] for k in range(25)]
    lo, hi = _kref._f1600_soa(lo, hi)
    for k in range(25):
        out_ref[k] = lo[k]
        out_ref[25 + k] = hi[k]


def f1600_folded(state: jnp.ndarray) -> jnp.ndarray:
    """Permute a folded state array uint32 [50, SB, 128] -> same shape."""
    sb = state.shape[1]
    pad = (-sb) % _TILE
    if pad:
        state = jnp.concatenate(
            [state, jnp.zeros((50, pad, 128), dtype=jnp.uint32)], axis=1
        )
    sbp = sb + pad
    out = pl.pallas_call(
        _kernel,
        grid=(sbp // _TILE,),
        in_specs=[
            pl.BlockSpec((50, _TILE, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((50, _TILE, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((50, sbp, 128), jnp.uint32),
    )(state)
    if pad:
        out = out[:, :sb]
    return out


def f1600_lists(lo, hi):
    """List-of-planes API matching keccak._f1600_soa. Shapes [SB, 128]."""
    state = jnp.stack(list(lo) + list(hi))
    out = f1600_folded(state)
    return [out[k] for k in range(25)], [out[25 + k] for k in range(25)]


# ---------------------------------------------------------------------------
# Fused XOF: absorb + every squeeze permutation in ONE kernel invocation.
#
# The per-permutation `f1600_lists` path pays a full HBM round-trip of the
# 1600-bit state (50 planes in + 50 out) and a kernel launch per
# permutation; a 5-block SHAKE256 squeeze (ExpandMask's shape) measured
# 2.2x SLOWER than the fused-by-XLA jnp path because of it. Here the state
# lives in vector registers/VMEM across all absorb and squeeze
# permutations — the input is read once (rate-lane words per block, pad
# already applied) and each output word plane is written once. This is the
# closest TPU analog of the reference's Keccak core, which keeps the
# 1600-bit state in a register through the whole absorb/squeeze schedule
# (`keccak_fsm2.vhd:46-78` shake_process/shake_output_wait loop).
# ---------------------------------------------------------------------------


def _xof_kernel(in_ref, out_ref, *, nblocks_in, rate_w, out_words):
    zeros = jnp.zeros_like(in_ref[0])
    lo = [zeros] * 25
    hi = [zeros] * 25
    nblocks_out = -(-out_words // (2 * rate_w))
    for b in range(nblocks_in):
        base = b * 2 * rate_w
        for k in range(rate_w):
            lo[k] = lo[k] ^ in_ref[base + 2 * k]
            hi[k] = hi[k] ^ in_ref[base + 2 * k + 1]
        lo, hi = _kref._f1600_soa(lo, hi)
    w = 0
    for i in range(nblocks_out):
        for k in range(rate_w):
            if w < out_words:
                out_ref[w] = lo[k]
                w += 1
            if w < out_words:
                out_ref[w] = hi[k]
                w += 1
        if i + 1 < nblocks_out:
            lo, hi = _kref._f1600_soa(lo, hi)


def _xof_mask_limb_kernel(in_ref, out_ref, *, nblocks_in, rate_w, out_words,
                          gamma1_bits, gamma1, out_dtype=jnp.int32):
    """Fused ExpandMask: XOF absorb/squeeze + gamma1_bits unpack + center
    + balanced base-256 int8 limb split, all register/VMEM-resident.

    out_ref: int32 [3*256, TILE, 128] — plane d*256 + j holds limb d of
    coefficient j for every state (one state = one mask polynomial).
    Values fit int8; int32 storage keeps Mosaic layouts simple, and the
    consuming int8 matmul fuses the narrowing cast into its operand read.

    This is the round-5 resolution of the XOF-unfold layout tax (PERF.md
    dead ends 9/10/16 falsified pure relayouts): the u32 word stream and
    the canonical y never exist in HBM; the MXU dots consume the
    coeff-major limb planes directly (`mxu._sign_attempt_mxu` fused
    path), and centered y is recombined from the limbs for the z chain.
    Measured 21%% faster than the unfold pipeline at the W=8192
    ExpandMask shape (`tools/fuse_exp.py` A/C interleaved, 2026-08-21).
    """
    zeros = jnp.zeros_like(in_ref[0])
    lo = [zeros] * 25
    hi = [zeros] * 25
    nblocks_out = -(-out_words // (2 * rate_w))
    words = []
    for b in range(nblocks_in):
        base = b * 2 * rate_w
        for k in range(rate_w):
            lo[k] = lo[k] ^ in_ref[base + 2 * k]
            hi[k] = hi[k] ^ in_ref[base + 2 * k + 1]
        lo, hi = _kref._f1600_soa(lo, hi)
    for i in range(nblocks_out):
        for k in range(rate_w):
            if len(words) < out_words:
                words.append(lo[k])
            if len(words) < out_words:
                words.append(hi[k])
        if i + 1 < nblocks_out and len(words) < out_words:
            lo, hi = _kref._f1600_soa(lo, hi)

    mask = jnp.uint32((1 << gamma1_bits) - 1)
    for j in range(256):
        bit = gamma1_bits * j
        w0 = bit >> 5
        sh = bit & 31
        r = words[w0] >> jnp.uint32(sh)
        if sh + gamma1_bits > 32:
            r = r | (words[w0 + 1] << jnp.uint32(32 - sh))
        r = r & mask
        y = jnp.int32(gamma1) - r.astype(jnp.int32)  # centered, |y|<=gamma1
        d0 = ((y + 128) & 255) - 128
        y1 = (y - d0) >> 8
        d1 = ((y1 + 128) & 255) - 128
        d2 = (y1 - d1) >> 8
        out_ref[j] = d0.astype(out_dtype)
        out_ref[256 + j] = d1.astype(out_dtype)
        out_ref[512 + j] = d2.astype(out_dtype)


def mask_limbs_folded(
    planes: jnp.ndarray, rate_w: int, gamma1_bits: int, gamma1: int,
    *, interpret: bool = False, out_dtype=jnp.int32, tile: int = _TILE
) -> jnp.ndarray:
    """Fused ExpandMask limbs on folded absorb planes.

    planes: uint32 [nblocks_in * 2*rate_w, SB, 128] absorb-ready lane
    words (as `shake_words_folded`). Returns out_dtype [3*256, SB, 128]:
    plane d*256 + j = balanced base-256 limb d of centered coefficient j
    (values always fit int8; out_dtype int8 saves the downstream narrow
    + relayout if Mosaic accepts the 8-bit store at this block shape).
    """
    import functools

    out_words = -(-(256 * gamma1_bits) // 32)
    n_in, sb, _ = planes.shape
    nblocks_in = n_in // (2 * rate_w)
    pad = (-sb) % tile
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.zeros((n_in, pad, 128), dtype=jnp.uint32)], axis=1
        )
    sbp = sb + pad
    kernel = functools.partial(
        _xof_mask_limb_kernel, nblocks_in=nblocks_in, rate_w=rate_w,
        out_words=out_words, gamma1_bits=gamma1_bits, gamma1=gamma1,
        out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(sbp // tile,),
        in_specs=[
            pl.BlockSpec((n_in, tile, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * 256, tile, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * 256, sbp, 128), out_dtype),
        interpret=interpret,
    )(planes)
    if pad:
        out = out[:, :sb]
    return out


def shake_words_folded(
    planes: jnp.ndarray, out_words: int, rate_w: int, *, interpret: bool = False
) -> jnp.ndarray:
    """Fused SHAKE on folded lane-word planes.

    planes: uint32 [nblocks_in * 2*rate_w, SB, 128] — absorb-ready lane
    words (lo/hi interleaved per lane, block-major; pad10*1 applied by the
    caller). Returns uint32 [out_words, SB, 128]: output-stream word j of
    every state (word j = squeeze bytes 4j..4j+3, little-endian).
    """
    import functools

    n_in, sb, _ = planes.shape
    nblocks_in = n_in // (2 * rate_w)
    pad = (-sb) % _TILE
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.zeros((n_in, pad, 128), dtype=jnp.uint32)], axis=1
        )
    sbp = sb + pad
    kernel = functools.partial(
        _xof_kernel, nblocks_in=nblocks_in, rate_w=rate_w, out_words=out_words
    )
    out = pl.pallas_call(
        kernel,
        grid=(sbp // _TILE,),
        in_specs=[
            pl.BlockSpec((n_in, _TILE, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_words, _TILE, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_words, sbp, 128), jnp.uint32),
        interpret=interpret,
    )(planes)
    if pad:
        out = out[:, :sb]
    return out
