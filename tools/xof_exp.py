"""A/B experiment: XOF output layout — where does the batch-major
transpose of the squeeze stream run?

A (shipped): `keccak._shake_words_fused` — the Mosaic kernel writes word
   PLANES [out_words, SB, 128]; XLA then transposes to batch-major
   [B, out_words] (`moveaxis` + reshape). That copy measured ~0.96 ms per
   sign round at W=4096 (docs/PERF.md trace table) — the largest single
   item of the attempt body, ~30x off pure HBM bandwidth for its size
   (strided minor-axis transpose pathology).
B: batch-major kernel — the SAME absorb/squeeze kernel, but each grid
   step transposes its [out_words, 8, 128] word planes to [1024,
   out_words] IN VMEM (jnp.transpose inside the kernel) and writes
   batch-major rows directly; no XLA transpose afterwards.

Both produce identical uint32 [B, out_words] (bit-checked in interpret
mode and vs hashlib).

Usage:
  CPU exactness:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/xof_exp.py check
  TPU timing:     python tools/xof_exp.py bench A|B
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

from dilithium_tpu.ops import keccak as K
from dilithium_tpu.ops import keccak_pallas as KP

_U32 = jnp.uint32
_TILE = KP._TILE


def _xof_kernel_bm(in_ref, out_ref, *, nblocks_in, rate_w, out_words):
    zeros = jnp.zeros_like(in_ref[0])
    lo = [zeros] * 25
    hi = [zeros] * 25
    nblocks_out = -(-out_words // (2 * rate_w))
    for b in range(nblocks_in):
        base = b * 2 * rate_w
        for k in range(rate_w):
            lo[k] = lo[k] ^ in_ref[base + 2 * k]
            hi[k] = hi[k] ^ in_ref[base + 2 * k + 1]
        lo, hi = K._f1600_soa(lo, hi)
    words = []
    for i in range(nblocks_out):
        for k in range(rate_w):
            if len(words) < out_words:
                words.append(lo[k])
            if len(words) < out_words:
                words.append(hi[k])
        if i + 1 < nblocks_out and len(words) < out_words:
            lo, hi = K._f1600_soa(lo, hi)
    # [out_words, TILE, 128] -> [TILE*128, out_words] in VMEM
    big = jnp.stack(words, axis=0)
    out_ref[...] = jnp.transpose(big, (1, 2, 0)).reshape(_TILE * 128, out_words)


def shake_words_batchmajor(planes, out_words, rate_w, *, interpret=False):
    """planes as in KP.shake_words_folded; returns uint32 [SB*128, out_words]."""
    n_in, sb, _ = planes.shape
    nblocks_in = n_in // (2 * rate_w)
    pad = (-sb) % _TILE
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.zeros((n_in, pad, 128), dtype=_U32)], axis=1
        )
    sbp = sb + pad
    kernel = functools.partial(
        _xof_kernel_bm, nblocks_in=nblocks_in, rate_w=rate_w, out_words=out_words
    )
    out = pl.pallas_call(
        kernel,
        grid=(sbp // _TILE,),
        in_specs=[
            pl.BlockSpec((n_in, _TILE, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE * 128, out_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sbp * 128, out_words), _U32),
        interpret=interpret,
    )(planes)
    return out[:sb * 128]


def _planes_for(data, rate):
    """Reproduce keccak._shake_words_fused's prologue. Returns (planes,
    batch_shape, b)."""
    msg_len = data.shape[-1]
    nblocks_in = msg_len // rate + 1
    padded_len = nblocks_in * rate
    folded, batch_shape, b = K._fold_batch(data.astype(jnp.uint8))
    padv = jnp.zeros(folded.shape[:-1] + (padded_len - msg_len,), dtype=jnp.uint8)
    padv = padv.at[..., 0].set(0x1F)
    padv = padv.at[..., -1].set(padv[..., -1] | 0x80)
    padded = jnp.concatenate([folded, padv], axis=-1)
    w32 = jax.lax.bitcast_convert_type(
        padded.reshape(padded.shape[:-1] + (padded_len // 4, 4)), jnp.uint32
    )
    return jnp.moveaxis(w32, -1, 0), batch_shape, b


def xof_bm(data, out_words, rate, *, interpret=False):
    """Batch-major fused SHAKE — same contract as keccak.shake_words."""
    planes, batch_shape, b = _planes_for(data, rate)
    out = shake_words_batchmajor(planes, out_words, rate // 8, interpret=interpret)
    return out[:b].reshape(batch_shape + (out_words,))


def check():
    import hashlib
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, size=(300, 66), dtype=np.uint8)
    out = np.asarray(xof_bm(jnp.asarray(msgs), 160, 136, interpret=True))
    ref_words = []
    for m in msgs:
        d = hashlib.shake_256(m.tobytes()).digest(640)
        ref_words.append(np.frombuffer(d, dtype="<u4"))
    ok = np.array_equal(out, np.stack(ref_words))
    print("batch-major XOF exact:", ok)
    assert ok


def bench(variant):
    B = 20480  # W=4096 x L=5 states — the ExpandMask shape of one round
    rng = np.random.default_rng(1)
    msgs = jnp.asarray(rng.integers(0, 256, size=(B, 66), dtype=np.uint8))

    if variant == "A":
        @jax.jit
        def run(m):
            return K.shake_words(m, 160, 136)  # fused kernel + XLA unfold
    else:
        @jax.jit
        def run(m):
            return xof_bm(m, 160, 136)

    out = run(msgs)
    _ = np.asarray(jnp.sum(out.ravel()[:8]))
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(msgs)
    _ = np.asarray(jnp.sum(out.ravel()[:8]))
    dt = time.perf_counter() - t0
    print(f"{variant}: {dt/iters*1e3:.3f} ms/call ({B} states, 160 words, "
          f"batch-major out)")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if sys.argv[1] == "check":
        check()
    else:
        bench(sys.argv[2])
