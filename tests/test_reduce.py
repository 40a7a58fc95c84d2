"""Differential tests for mod-q arithmetic vs exact numpy int64.

Analog of the reference's randomized C++ self-tests
(`hardware_code/ntt2x2_test.cpp:139-197`) at the arithmetic-primitive
level (`rtl_src/Barrett_8380417.v`).
"""

import numpy as np
import jax.numpy as jnp

from dilithium_tpu.params import Q
from dilithium_tpu.ops import reduce as r

RNG = np.random.default_rng(0)


def _rand_q(shape):
    return RNG.integers(0, Q, size=shape, dtype=np.uint32)


def test_mulhi_u32():
    a = RNG.integers(0, 1 << 32, size=(4096,), dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, 1 << 32, size=(4096,), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(r.mulhi_u32(jnp.asarray(a), jnp.asarray(b)))
    exp = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, exp)


def test_mont_mul_matches_exact():
    a = _rand_q((8192,))
    b = _rand_q((8192,))
    got = np.asarray(r.mont_mul(jnp.asarray(a), jnp.asarray(b)))
    rinv = pow(1 << 32, -1, Q)
    exp = (a.astype(object) * b.astype(object) * rinv % Q).astype(np.uint32)
    np.testing.assert_array_equal(got, exp)
    assert got.max() < Q


def test_mont_roundtrip():
    a = _rand_q((4096,))
    back = np.asarray(r.from_mont(r.to_mont(jnp.asarray(a))))
    np.testing.assert_array_equal(back, a)


def test_mul_mod():
    a = _rand_q((4096,))
    b = _rand_q((4096,))
    got = np.asarray(r.mul_mod(jnp.asarray(a), jnp.asarray(b)))
    exp = (a.astype(np.uint64) * b.astype(np.uint64) % Q).astype(np.uint32)
    np.testing.assert_array_equal(got, exp)


def test_add_sub_neg():
    a = _rand_q((4096,))
    b = _rand_q((4096,))
    np.testing.assert_array_equal(
        np.asarray(r.add_mod(jnp.asarray(a), jnp.asarray(b))),
        ((a.astype(np.uint64) + b) % Q).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(r.sub_mod(jnp.asarray(a), jnp.asarray(b))),
        ((a.astype(np.int64) - b + Q) % Q).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(r.neg_mod(jnp.asarray(a))),
        ((Q - a.astype(np.int64)) % Q).astype(np.uint32),
    )


def test_center_uncenter():
    a = _rand_q((4096,))
    c = np.asarray(r.center(jnp.asarray(a)))
    assert c.min() > -Q // 2 - 1 and c.max() <= Q // 2
    np.testing.assert_array_equal(np.asarray(r.uncenter(jnp.asarray(c))), a)
    # uncenter also accepts any value in (-q, q)
    m = RNG.integers(-(Q - 1), Q, size=(4096,), dtype=np.int64).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(r.uncenter(jnp.asarray(m))), ((m.astype(np.int64) + Q) % Q).astype(np.uint32)
    )
