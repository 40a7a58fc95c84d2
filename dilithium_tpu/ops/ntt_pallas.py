"""Pallas TPU kernel for the batched 256-point NTT over Z_q.

Layout strategy: the jnp path (`ops/ntt.py`) works on [B, 256] with rolls
along the 128-lane axis. This kernel instead runs on the TRANSPOSED
layout [256, B]: coefficients on the sublane axis, batch on the lane axis.
Butterfly partners at distance len >= 8 then live in different vector
registers entirely (the roll is a VREG renumbering, free at compile time),
and len in {4, 2, 1} are cheap sublane rotates — no lane crossings at all.
The batch dimension fills the 128 lanes, which is exactly how the FPGA's
4-butterfly × pipelined parallelism (`butterfly2x2.v`, SURVEY.md §2.2)
maps onto a VPU.

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
from dilithium_tpu.ops.reduce import mont_mul, add_mod, sub_mod

_FWD_LENGTHS = ntt_ref._FWD_LENGTHS
_INV_LENGTHS = ntt_ref._INV_LENGTHS

# per-stage zeta columns for the transposed layout: [8, 256]
_FWD_Z = np.asarray(ntt_ref._FWD_ZETAS)
_INV_Z = np.asarray(ntt_ref._INV_ZETAS)

_LANES = 256  # batch tile (lane axis); multiple of 128


def _stage(x, zeta_col, length):
    """One butterfly stage on [256, TB]; zeta_col [256, 1]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    is_a = (rows % (2 * length)) < length
    partner_dn = pltpu.roll(x, 256 - length, 0)  # row j sees x[j+len]
    partner_up = pltpu.roll(x, length, 0)        # row j sees x[j-len]
    b_operand = jnp.where(is_a, partner_dn, x)
    t = mont_mul(zeta_col, b_operand)
    return jnp.where(is_a, add_mod(x, t), sub_mod(partner_up, t))


def _inv_stage(x, zeta_col, length):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    is_a = (rows % (2 * length)) < length
    partner_dn = pltpu.roll(x, 256 - length, 0)
    partner_up = pltpu.roll(x, length, 0)
    a_new = add_mod(x, partner_dn)
    b_new = mont_mul(zeta_col, sub_mod(partner_up, x))
    return jnp.where(is_a, a_new, b_new)


def _fwd_kernel(x_ref, z_ref, o_ref):
    x = x_ref[:]
    for s, length in enumerate(_FWD_LENGTHS):
        x = _stage(x, z_ref[s][:, None], length)
    o_ref[:] = x


def _inv_kernel(x_ref, z_ref, o_ref, *, scale):
    x = x_ref[:]
    for s, length in enumerate(_INV_LENGTHS):
        x = _inv_stage(x, z_ref[s][:, None], length)
    o_ref[:] = mont_mul(x, np.uint32(scale))


def _run(kernel, x, ztab):
    """x: uint32 [..., 256] -> same shape; batch flattened onto lanes."""
    shape = x.shape
    flat = x.reshape((-1, 256)).astype(jnp.uint32)
    b = flat.shape[0]
    pad = (-b) % _LANES
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 256), dtype=jnp.uint32)], axis=0
        )
    xt = flat.T  # [256, B']
    bp = xt.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(bp // _LANES,),
        in_specs=[
            pl.BlockSpec((256, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, bp), jnp.uint32),
    )(xt, jnp.asarray(ztab))
    res = out.T
    if pad:
        res = res[:b]
    return res.reshape(shape)


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT, bit-identical to ops/ntt.py ntt()."""
    return _run(_fwd_kernel, x, _FWD_Z)


def invntt(x: jnp.ndarray, from_product: bool = True) -> jnp.ndarray:
    """Inverse NTT, bit-identical to ops/ntt.py invntt()."""
    scale = ntt_ref._F_PRODUCT if from_product else ntt_ref._F_PLAIN
    kernel = functools.partial(_inv_kernel, scale=scale)
    return _run(kernel, x, _INV_Z)
