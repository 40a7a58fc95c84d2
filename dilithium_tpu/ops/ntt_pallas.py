"""Pallas TPU kernel for the batched 256-point NTT over Z_q.

Layout strategy: the jnp path (`ops/ntt.py`) works on [B, 256] with rolls
along the 128-lane axis. This kernel instead runs on the TRANSPOSED
layout [256, B]: coefficients on the sublane axis, batch on the lane axis.
Butterfly partners at distance len >= 8 then live in different (8, 128)
register tiles entirely, so each of those stages is expressed as STATIC
row-chunk slices — the Montgomery multiply runs only on the b-half of
each block (half the rows) with the stage zeta as a scalar immediate, the
a-half costs one add/sub each, and there are no rolls or selects at all.
Only len in {4, 2, 1} (sub-tile interleavings) use the full-width
roll+select form. This is ~1.6x fewer VPU ops than a uniform full-width
stage. The batch dimension fills the 128 lanes, which is exactly how the
FPGA's 4-butterfly x pipelined parallelism (`butterfly2x2.v`,
SURVEY.md §2.2) maps onto a VPU.

All 8 stages (+ the final scaling) run in one kernel invocation with the
working set resident in VMEM — the analog of `operation_module.v` keeping
a poly in BRAM across its 4 two-stage passes, but with zero address
resolution (`address_resolver.v` disappears).

The XLA-side wrapper transposes [B, 256] <-> [256, B] at the boundary
(XLA's transpose is fast and fuses with neighbors); bit-exactness vs the
jnp path is pinned by tests/test_ntt_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from dilithium_tpu.params import Q
from dilithium_tpu.ops import ntt as ntt_ref
from dilithium_tpu.ops.reduce import add_mod, shoup_mul, sub_mod

_FWD_LENGTHS = ntt_ref._FWD_LENGTHS
_INV_LENGTHS = ntt_ref._INV_LENGTHS

# Per-stage zeta columns for the transposed layout, as (plain value,
# Shoup companion) pairs: every zeta is a trace-time constant, so the
# kernel multiplies with `shoup_mul` (6 hardware int32 multiplies) instead
# of `mont_mul` (10) — the kernel is multiply-emulation-bound on the VPU.
# The jnp path keeps its independent Montgomery formulation, which is what
# the bit-exactness tests pin this kernel against.
_R_INV = pow(1 << 32, -1, Q)


def _plain(mont_tab: np.ndarray) -> np.ndarray:
    """Montgomery-form table (v*R mod q) -> plain factor v mod q."""
    return (mont_tab.astype(np.uint64) * _R_INV % Q).astype(np.uint32)


def _shoup(plain_tab) -> np.ndarray:
    """floor(v << 32 / q) companion for `shoup_mul`."""
    return ((np.asarray(plain_tab, dtype=np.uint64) << 32) // Q).astype(
        np.uint32
    )


_FWD_Z = _plain(np.asarray(ntt_ref._FWD_ZETAS))
_INV_Z = _plain(np.asarray(ntt_ref._INV_ZETAS))
_FWD_ZTAB = np.concatenate([_FWD_Z, _shoup(_FWD_Z)], axis=0)  # [16, 256]
_INV_ZTAB = np.concatenate([_INV_Z, _shoup(_INV_Z)], axis=0)

# Batch tile (lane axis). Wider tiles amortize per-grid-step overhead:
# measured 60.8/60.2/52.5/49.3 ns/poly at 256/512/1024/2048 lanes on v5e
# (B=65536); 4096 overflows VMEM (4 MB in + 4 MB out + spills). Small
# batches fall back to 256 to bound padding waste.
_LANES_MAX = 2048
_LANES_MIN = 256
_SUB = 8      # sublane tile: rows per chunk


def _subtile_stage(chunk, zcol, zscol, length, inverse):
    """Full-width butterfly on one [8, TB] chunk for length in {4, 2, 1}."""
    rows = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 0)
    is_a = (rows % (2 * length)) < length
    partner_dn = pltpu.roll(chunk, _SUB - length, 0)  # row j sees row j+len
    partner_up = pltpu.roll(chunk, length, 0)         # row j sees row j-len
    if inverse:
        a_new = add_mod(chunk, partner_dn)
        b_new = shoup_mul(sub_mod(partner_up, chunk), zcol, zscol)
        return jnp.where(is_a, a_new, b_new)
    b_operand = jnp.where(is_a, partner_dn, chunk)
    t = shoup_mul(b_operand, zcol, zscol)
    return jnp.where(is_a, add_mod(chunk, t), sub_mod(partner_up, t))


def _run_stages(chunks, ztab, z_ref, lengths, inverse):
    """chunks: list of 32 [8, TB] tiles (rows 8i..8i+7). In-register NTT.

    Block-constant zetas (len >= 8) come from `ztab` (the numpy table) as
    scalar immediates; per-row zeta columns for the sub-tile stages are
    sliced from the `z_ref` VMEM input (Pallas kernels cannot capture
    array constants).
    """
    for s, length in enumerate(lengths):
        if length >= _SUB:
            lc = length // _SUB            # chunks per half-block
            nblocks = 256 // (2 * length)
            for blk in range(nblocks):
                base = 2 * lc * blk
                # scalar immediates: plain zeta + Shoup companion
                z = np.uint32(ztab[s, 2 * length * blk])
                zs = np.uint32(ztab[8 + s, 2 * length * blk])
                for j in range(lc):
                    a = chunks[base + j]
                    b = chunks[base + lc + j]
                    if inverse:
                        chunks[base + j] = add_mod(a, b)
                        chunks[base + lc + j] = shoup_mul(sub_mod(a, b), z, zs)
                    else:
                        t = shoup_mul(b, z, zs)
                        chunks[base + j] = add_mod(a, t)
                        chunks[base + lc + j] = sub_mod(a, t)
        else:
            for i in range(32):
                zcol = z_ref[s, _SUB * i: _SUB * (i + 1)][:, None]
                zscol = z_ref[8 + s, _SUB * i: _SUB * (i + 1)][:, None]
                chunks[i] = _subtile_stage(
                    chunks[i], zcol, zscol, length, inverse
                )
    return chunks


def _fwd_kernel(x_ref, z_ref, o_ref):
    chunks = [x_ref[_SUB * i: _SUB * (i + 1), :] for i in range(32)]
    chunks = _run_stages(chunks, _FWD_ZTAB, z_ref, _FWD_LENGTHS, inverse=False)
    for i in range(32):
        o_ref[_SUB * i: _SUB * (i + 1), :] = chunks[i]


def _inv_kernel(x_ref, z_ref, o_ref, *, scale):
    chunks = [x_ref[_SUB * i: _SUB * (i + 1), :] for i in range(32)]
    chunks = _run_stages(chunks, _INV_ZTAB, z_ref, _INV_LENGTHS, inverse=True)
    g = np.uint32(scale * _R_INV % Q)  # plain factor of the mont constant
    gs = np.uint32((int(g) << 32) // Q)
    for i in range(32):
        o_ref[_SUB * i: _SUB * (i + 1), :] = shoup_mul(chunks[i], g, gs)


def _run(kernel, x, ztab):
    """x: uint32 [..., 256] -> same shape; batch flattened onto lanes."""
    shape = x.shape
    flat = x.reshape((-1, 256)).astype(jnp.uint32)
    b = flat.shape[0]
    lanes = _LANES_MAX if b >= _LANES_MAX else _LANES_MIN
    pad = (-b) % lanes
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 256), dtype=jnp.uint32)], axis=0
        )
    xt = flat.T  # [256, B']
    bp = xt.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(bp // lanes,),
        in_specs=[
            pl.BlockSpec((256, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, bp), jnp.uint32),
    )(xt, jnp.asarray(ztab))
    res = out.T
    if pad:
        res = res[:b]
    return res.reshape(shape)


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT, bit-identical to ops/ntt.py ntt()."""
    return _run(_fwd_kernel, x, _FWD_ZTAB)


def invntt(x: jnp.ndarray, from_product: bool = True) -> jnp.ndarray:
    """Inverse NTT, bit-identical to ops/ntt.py invntt()."""
    scale = ntt_ref._F_PRODUCT if from_product else ntt_ref._F_PLAIN
    kernel = functools.partial(_inv_kernel, scale=scale)
    return _run(kernel, x, _INV_ZTAB)
