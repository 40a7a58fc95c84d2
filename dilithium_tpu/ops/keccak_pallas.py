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
