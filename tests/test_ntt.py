"""Differential NTT tests vs an exact numpy negacyclic-convolution oracle.

Analog of `reference_code/ref_test_ntt_ntt2x2.cpp:44-93` (random polys,
transform vs textbook) and `hardware_code/ntt2x2_test.cpp:109-137`
(NTT -> pointwise MUL -> INTT chained as the hardware does).
"""

import numpy as np
import jax.numpy as jnp

from dilithium_tpu.params import Q, N
from dilithium_tpu.ops import ntt
from dilithium_tpu.ops.reduce import to_mont

RNG = np.random.default_rng(1)


def _rand_poly(shape):
    return RNG.integers(0, Q, size=shape + (N,), dtype=np.uint32)


def _negacyclic_mul(a, b):
    """Exact schoolbook product mod (X^256 + 1, q). a, b: [..., 256] uint."""
    a = a.astype(object)
    b = b.astype(object)
    out = np.zeros(a.shape, dtype=object)
    for i in range(N):
        # c[k] += a[i] * b[k-i], with wraparound sign
        rolled = np.roll(b, i, axis=-1).copy()
        rolled[..., :i] = (-rolled[..., :i]) % Q
        out = (out + a[..., i: i + 1] * rolled) % Q
    return out.astype(np.uint32)


def test_ntt_invntt_roundtrip():
    x = _rand_poly((16,))
    y = np.asarray(ntt.invntt(ntt.ntt(jnp.asarray(x)), from_product=False))
    np.testing.assert_array_equal(y, x)


def test_ntt_linearity():
    x = _rand_poly((8,))
    y = _rand_poly((8,))
    fx = np.asarray(ntt.ntt(jnp.asarray(x))).astype(np.uint64)
    fy = np.asarray(ntt.ntt(jnp.asarray(y))).astype(np.uint64)
    fxy = np.asarray(ntt.ntt(jnp.asarray((x.astype(np.uint64) + y) % Q)))
    np.testing.assert_array_equal(fxy, ((fx + fy) % Q).astype(np.uint32))


def test_poly_mul_matches_schoolbook():
    x = _rand_poly((4,))
    y = _rand_poly((4,))
    got = np.asarray(ntt.poly_mul(jnp.asarray(x), jnp.asarray(y)))
    exp = _negacyclic_mul(x, y)
    np.testing.assert_array_equal(got, exp)


def test_poly_mul_delta():
    """delta * p == p; X^1 * p == rotate with sign flip."""
    p = _rand_poly((2,))
    delta = np.zeros((2, N), dtype=np.uint32)
    delta[:, 0] = 1
    np.testing.assert_array_equal(
        np.asarray(ntt.poly_mul(jnp.asarray(delta), jnp.asarray(p))), p
    )
    x1 = np.zeros((2, N), dtype=np.uint32)
    x1[:, 1] = 1
    got = np.asarray(ntt.poly_mul(jnp.asarray(x1), jnp.asarray(p)))
    exp = np.roll(p, 1, axis=-1).astype(np.int64)
    exp[:, 0] = (-exp[:, 0]) % Q
    np.testing.assert_array_equal(got, exp.astype(np.uint32))


def test_matvec_accumulates():
    a = _rand_poly((3, 2))  # K=3, L=2
    s = _rand_poly((2,))
    a_hat = ntt.ntt(jnp.asarray(a))
    s_hat = ntt.ntt(jnp.asarray(s))
    got = np.asarray(ntt.invntt(ntt.matvec(a_hat, s_hat), from_product=True))
    exp = np.zeros((3, N), dtype=np.uint64)
    for k in range(3):
        acc = np.zeros(N, dtype=np.uint64)
        for l in range(2):
            acc = (acc + _negacyclic_mul(a[k, l], s[l])) % Q
        exp[k] = acc
    np.testing.assert_array_equal(got, exp.astype(np.uint32))


def test_pointwise_carries_rinv():
    """pointwise == mont_mul: x*y*R^-1; to_mont undoes it."""
    x = _rand_poly(())
    y = _rand_poly(())
    prod = np.asarray(to_mont(ntt.pointwise(jnp.asarray(x), jnp.asarray(y))))
    exp = (x.astype(object) * y.astype(object) % Q).astype(np.uint32)
    np.testing.assert_array_equal(prod, exp)
