"""A/B/C experiment: mega-fused ExpandMask -> y-limb kernel (VERDICT r4 #3).

The r04 trace puts 139 us/round on the XOF-output unfold `reshape` and
82 us on `convert_element_type` (u8<->i8/i32 casts), out of ~535 us of
device self-time per signing round (W=768). Pure relayout fixes were
falsified three ways (PERF.md dead ends 9/10/16); the remaining angle is
FUSION — consume the XOF words inside the Mosaic kernel that produced
them: unpack the 20-bit slices, center (y = gamma1 - r is already the
centered value), split into the 3 balanced base-256 int8 limbs the MXU
dots need, and never materialize the u32 word stream or the canonical y
in HBM at all.

Variants (all at the real ExpandMask shape: W x L states, 160 words):
  A: shipped pipeline — `expand_mask` (fused XOF kernel + XLA unfold +
     unpack + uncenter) -> center -> limb split -> 3 cat-grouped int8
     dots (`mxu._apply_wy` semantics).
  B: fused kernel emits int8 limb PLANES [3*N, S, 128] (poly-major state
     order, so the msg axis reshapes cleanly) -> 3 coeff-major
     dot_generals against the [L, N, 3KN] reshaped operator. No unfold,
     no XLA-side casts; y itself is never materialized.
  C: B + batch-major y reconstruction (what the real attempt also needs
     for z = y + cs1): one extra limb-recombine transpose. If C >= A the
     fusion cannot win end-to-end without also restructuring the z path.

Usage:
  CPU exactness:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/fuse_exp.py check
  TPU timing:     python tools/fuse_exp.py bench A|B|C [W=768]
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
_I32 = jnp.int32
_I8 = jnp.int8
_TILE = KP._TILE
N = 256


def _mask_msgs_polymajor(rhoprime, kappa, p):
    """ExpandMask messages in POLY-MAJOR state order [L, W, 66]."""
    from dilithium_tpu.ops.sampling import _le16
    W = rhoprime.shape[0]
    nonces = kappa[None, :].astype(_U32) + jnp.arange(
        p.L, dtype=_U32)[:, None]  # [L, W]
    return jnp.concatenate(
        [jnp.broadcast_to(rhoprime[None], (p.L, W, 64)).astype(jnp.uint8),
         _le16(nonces)], axis=-1,
    )


def _absorb_planes(data, rate):
    msg_len = data.shape[-1]
    nblocks_in = msg_len // rate + 1
    padded_len = nblocks_in * rate
    folded, batch_shape, b = K._fold_batch(data.astype(jnp.uint8))
    padv = jnp.zeros(folded.shape[:-1] + (padded_len - msg_len,), dtype=jnp.uint8)
    padv = padv.at[..., 0].set(0x1F)
    padv = padv.at[..., -1].set(padv[..., -1] | 0x80)
    padded = jnp.concatenate([folded, padv], axis=-1)
    w32 = jax.lax.bitcast_convert_type(
        padded.reshape(padded.shape[:-1] + (padded_len // 4, 4)), _U32
    )
    return jnp.moveaxis(w32, -1, 0), batch_shape, b


def fused_limbs(rhoprime, kappa, p, *, interpret=False, out_dtype=_I32):
    """-> limb array [3, N, L, W] (coeff-major, msg minor).

    Requires W % 128 == 0 so the folded (sublane, lane) axes reshape into
    (L, W) without element movement. Delegates to the production kernel
    (`keccak_pallas.mask_limbs_folded`); out_dtype int8 is the D variant
    (skip the downstream narrowing + relayout of the i32 planes).
    """
    W = rhoprime.shape[0]
    assert W % 128 == 0
    msgs = _mask_msgs_polymajor(rhoprime, kappa, p)  # [L, W, 66]
    planes, _, b = _absorb_planes(msgs, 136)
    out = KP.mask_limbs_folded(planes, 136 // 8, p.gamma1_bits,
                               p.gamma1, interpret=interpret,
                               out_dtype=out_dtype)
    return out.reshape(3, N, p.L, W)


def y_from_limbs(limbs):
    """[3, N, L, W] limbs -> centered y batch-major [W, L, N] (variant C)."""
    l32 = limbs.astype(_I32)
    yc = l32[0] + (l32[1] << 8) + (l32[2] << 16)  # [N, L, W]
    return jnp.transpose(yc, (2, 1, 0))


# --------------------------------------------------------------------------
# pipelines
# --------------------------------------------------------------------------


def pipeline_a(ops_wy_cat, rhoprime, kappa, p):
    """Shipped: expand_mask -> center/limb -> 3 cat dots."""
    from dilithium_tpu import mxu
    from dilithium_tpu.ops import sampling
    W = rhoprime.shape[0]
    y = sampling.expand_mask(rhoprime, kappa, p)  # [W, L, N] canonical
    w = mxu._apply_wy(y.reshape(W, p.L * N), None, p, ops_wy_cat)
    return w, y


def _recombine_from_prods(prods, p):
    from dilithium_tpu import mxu
    return mxu._recombine(prods[0], prods[1], prods[2], prods[3], prods[4])


def pipeline_b(ops_wy_r, rhoprime, kappa, p, *, interpret=False,
               want_y=False, out_dtype=_I32):
    """Fused kernel -> coeff-major dots. ops_wy_r: int8 [L, N, 3KN]."""
    limbs = fused_limbs(rhoprime, kappa, p, interpret=interpret,
                        out_dtype=out_dtype)
    W = rhoprime.shape[0]
    kn = ops_wy_r.shape[-1] // 3
    prods = {}
    for i in range(3):
        lhs = limbs[i].astype(_I8)  # [N, L, W]
        p3 = jax.lax.dot_general(
            lhs, ops_wy_r,
            (((0, 1), (1, 0)), ((), ())),
            preferred_element_type=_I32,
        )  # [W, 3KN]
        for j in range(3):
            pij = p3[..., j * kn:(j + 1) * kn]
            k = i + j
            prods[k] = pij if k not in prods else prods[k] + pij
    w = _recombine_from_prods(prods, p)
    if want_y:
        from dilithium_tpu.ops.reduce import uncenter
        y = uncenter(y_from_limbs(limbs))
        return w, y
    return w, None


def check(interpret=True):
    """Differential check of pipeline B vs the shipped pipeline A.

    `check` (CPU): interpret-mode Mosaic — exact but VERY slow (the tail
    unpack interprets ~100k vector ops; >40 min). `check_tpu`: run BOTH
    pipelines on the real chip and byte-compare — all ops are exact
    integer arithmetic, so device-vs-device equality is the same
    statement, minutes instead.
    """
    from dilithium_tpu import mxu, params, scheme
    from dilithium_tpu.ops import sampling

    p = params.get_params(3)
    rng = np.random.default_rng(0)
    W = 128
    seed = jnp.asarray(rng.integers(0, 256, (32,), dtype=np.uint8))
    kp = scheme.keygen(seed, p)
    ops = mxu.build_operators(kp.sk, p)
    rhoprime = jnp.asarray(rng.integers(0, 256, (W, 64), dtype=np.uint8))
    kappa = jnp.asarray(rng.integers(0, 50, (W,), dtype=np.uint32) * p.L)

    w_a, y_a = jax.jit(lambda r, k: pipeline_a(ops.wy_cat, r, k, p))(
        rhoprime, kappa)
    ops_wy_r = ops.wy_cat.reshape(p.L, N, -1)
    if interpret:
        w_b, y_b = pipeline_b(ops_wy_r, rhoprime, kappa, p, interpret=True,
                              want_y=True)
    else:
        w_b, y_b = jax.jit(
            functools.partial(pipeline_b, ops_wy_r, p=p, want_y=True)
        )(rhoprime, kappa)
    ok_w = np.array_equal(np.asarray(w_a), np.asarray(w_b))
    ok_y = np.array_equal(np.asarray(y_a), np.asarray(y_b))
    print("w exact:", ok_w, " y exact:", ok_y)
    assert ok_w and ok_y
    if not interpret:
        # D variant: int8 kernel output
        w_d, y_d = jax.jit(
            functools.partial(pipeline_b, ops_wy_r, p=p, want_y=True,
                              out_dtype=_I8)
        )(rhoprime, kappa)
        ok_wd = np.array_equal(np.asarray(w_a), np.asarray(w_d))
        ok_yd = np.array_equal(np.asarray(y_a), np.asarray(y_d))
        print("D (i8 out) w exact:", ok_wd, " y exact:", ok_yd)
        assert ok_wd and ok_yd


def bench(variant, W):
    from dilithium_tpu import mxu, params, scheme

    p = params.get_params(3)
    rng = np.random.default_rng(1)
    seed = jnp.asarray(rng.integers(0, 256, (32,), dtype=np.uint8))
    kp = scheme.keygen(seed, p)
    ops = mxu.build_operators(kp.sk, p)
    rhoprime = jnp.asarray(rng.integers(0, 256, (W, 64), dtype=np.uint8))
    kappa = jnp.asarray(rng.integers(0, 50, (W,), dtype=np.uint32) * p.L)

    if variant == "A":
        fn = jax.jit(lambda r, k: pipeline_a(ops.wy_cat, r, k, p))
    else:
        ops_wy_r = ops.wy_cat.reshape(p.L, N, -1)
        want_y = variant in ("C", "D")
        out_dtype = _I8 if variant == "D" else _I32
        fn = jax.jit(functools.partial(
            pipeline_b, ops_wy_r, p=p, want_y=want_y, out_dtype=out_dtype))

    def run(r, k):
        out = fn(r, k)
        return out[0] if out[1] is None else (out[0], out[1])

    out = run(rhoprime, kappa)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.sum(leaf.ravel()[:8].astype(jnp.uint32)))
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(rhoprime, kappa)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.sum(leaf.ravel()[:8].astype(jnp.uint32)))
    dt = time.perf_counter() - t0
    print(f"{variant}: {dt/iters*1e3:.3f} ms/call (W={W}, y->w chain"
          f"{' + y out' if variant == 'C' else ''})")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    if sys.argv[1] == "check":
        check()
    elif sys.argv[1] == "check_tpu":
        check(interpret=False)
    else:
        bench(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 768)
