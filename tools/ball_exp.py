"""A/B experiment: SampleInBall Pallas kernel phase-2 representations.

V0: shipped kernel (`ops/ball_pallas.py`): challenge poly c held as a
    [256, 128] uint32 array (32 vregs); each Fisher-Yates swap step does a
    256-row one-hot select + reduce to read c[j] and two 256-row wheres to
    write — ~160 vreg-ops per step.
V1: c held as TWO bit-planes [8, 128] (nz = nonzero mask, sg = sign mask,
    coefficient r at row r>>5 bit r&31 — the TPU analog of the RTL's
    in-register 256x2-bit poly, `gen_c.v:215-222`); swap steps become
    8-row onehot bit extract/insert with per-lane variable shifts (~20
    vreg-ops per step), and c materializes to [256, 128] once at the end.

RESULT (2026-08-20, v5e-1, B=16384, level 3): a WASH — V0 90.5/93.8
ns/msg vs V1 89.1/94.6 interleaved. The kernel is not bound by the swap
phase's vector-op count; V0 stays shipped. Kept for re-evaluation if the
ball kernel ever becomes the bottleneck (e.g. much larger tau).

Usage:
  CPU exactness:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/ball_exp.py check
  TPU timing:     python tools/ball_exp.py bench V0|V1
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dilithium_tpu.params import Q, N
from dilithium_tpu.ops import ball_pallas, keccak, sampling

_U32 = jnp.uint32
_I32 = jnp.int32


def _kernel_v1(w_ref, c_ref, ok_ref, *, tau, nbytes):
    def word(i):
        return w_ref[i:i + 1, :].astype(_U32)  # (1, 128)

    sign_lo = word(0)
    sign_hi = word(1)

    # Phase 1 — identical to V0: collect the first tau accepted bytes.
    cnt = jnp.zeros((1, 128), _I32)
    jrow = jax.lax.broadcasted_iota(_I32, (64, 128), 0)
    j_buf = jnp.zeros((64, 128), _I32)
    for t in range(8, nbytes):
        byte = ((word(t // 4) >> _U32(8 * (t % 4))) & _U32(0xFF)).astype(_I32)
        take = (byte <= (N - tau) + cnt) & (cnt < tau)  # (1, 128)
        j_buf = jnp.where((jrow == cnt) & take, byte, j_buf)
        cnt = cnt + take.astype(_I32)
    ok_ref[0:1, :] = (cnt >= tau).astype(_U32)

    # Phase 2 — bit-plane swaps: nz/sg [8, 128], coeff r = row r>>5 bit r&31.
    rows8 = jax.lax.broadcasted_iota(_I32, (8, 128), 0)
    nz = jnp.zeros((8, 128), _U32)
    sg = jnp.zeros((8, 128), _U32)
    one = _U32(1)
    for t in range(tau):
        j = j_buf[t:t + 1, :]                        # (1, 128) i32
        j_row = j >> 5
        j_bit = (j & 31).astype(_U32)                # (1, 128)
        onehot = rows8 == j_row                      # (8, 128)
        # read c[j] bits (i32 reduce: no unsigned reductions in Mosaic)
        nz_j = jnp.sum(
            jnp.where(onehot, ((nz >> j_bit) & one).astype(_I32), 0),
            axis=0, keepdims=True,
        ).astype(_U32)                               # (1, 128) in {0, 1}
        sg_j = jnp.sum(
            jnp.where(onehot, ((sg >> j_bit) & one).astype(_I32), 0),
            axis=0, keepdims=True,
        ).astype(_U32)
        # c[i] = c[j], i = N - tau + t (static row/bit)
        i_row, i_bit = (N - tau + t) >> 5, (N - tau + t) & 31
        sel_i = rows8 == i_row
        clr = _U32(~np.uint32(1 << i_bit))
        nz = jnp.where(sel_i, (nz & clr) | (nz_j << _U32(i_bit)), nz)
        sg = jnp.where(sel_i, (sg & clr) | (sg_j << _U32(i_bit)), sg)
        # c[j] = +-1 by sign bit t (after c[i], so j == i resolves to +-1)
        bit = ((sign_lo >> _U32(t)) if t < 32 else (sign_hi >> _U32(t - 32))) & one
        mask = one << j_bit                          # (1, 128) broadcast
        nz = jnp.where(onehot, nz | mask, nz)
        sg = jnp.where(onehot, (sg & ~mask) | (bit << j_bit), sg)

    # materialize c [256, 128] from the planes, 32 rows per plane row
    shifts = jax.lax.broadcasted_iota(_U32, (32, 128), 0)
    for r in range(8):
        nzb = (jnp.broadcast_to(nz[r:r + 1, :], (32, 128)) >> shifts) & one
        sgb = (jnp.broadcast_to(sg[r:r + 1, :], (32, 128)) >> shifts) & one
        c_ref[32 * r:32 * (r + 1), :] = nzb * jnp.where(
            sgb == one, _U32(Q - 1), _U32(1)
        )


def _call(kernel, words, tau, nbytes, interpret=False):
    nw = words.shape[-1]
    flat = words.reshape((-1, nw)).astype(_U32)
    b = flat.shape[0]
    pad = (-b) % 128
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, nw), _U32)], axis=0)
    bp = b + pad
    xt = flat.T
    c, ok = pl.pallas_call(
        functools.partial(kernel, tau=tau, nbytes=nbytes),
        grid=(bp // 128,),
        in_specs=[pl.BlockSpec((nw, 128), lambda i: (0, i), memory_space=pltpu.VMEM)],
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
    return c.T[:b], (ok[0, :b] > 0)


def check():
    from dilithium_tpu import params
    rng = np.random.default_rng(0)
    for level in (2, 3, 5):
        p = params.get_params(level)
        nbytes = (p.ball_blocks * 136 // 4) * 4
        ct = jnp.asarray(rng.integers(0, 256, (256, 32), dtype=np.uint8))
        words = keccak.shake256_words(ct, nbytes // 4)
        c0, ok0 = _call(ball_pallas._kernel, words, p.tau, nbytes, interpret=True)
        c1, ok1 = _call(_kernel_v1, words, p.tau, nbytes, interpret=True)
        same = np.array_equal(np.asarray(c0), np.asarray(c1)) and np.array_equal(
            np.asarray(ok0), np.asarray(ok1)
        )
        print(f"level {level}: V0 == V1: {same}")
        assert same


def bench(variant):
    from dilithium_tpu import params
    p = params.get_params(3)
    nbytes = (p.ball_blocks * 136 // 4) * 4
    B = 16384
    rng = np.random.default_rng(1)
    ct = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    words = jax.jit(lambda x: keccak.shake256_words(x, nbytes // 4))(ct)
    jax.block_until_ready(words)
    kernel = ball_pallas._kernel if variant == "V0" else _kernel_v1

    @jax.jit
    def run(w):
        return _call(kernel, w, p.tau, nbytes)

    out = run(words)
    _ = np.asarray(jnp.sum(out[0].ravel()[:8]))
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(words)
    _ = np.asarray(jnp.sum(out[0].ravel()[:8]))
    dt = time.perf_counter() - t0
    print(f"{variant}: {dt/iters*1e3:.3f} ms/call  {dt/iters/B*1e9:.2f} ns/msg")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if sys.argv[1] == "check":
        check()
    else:
        bench(sys.argv[2])
