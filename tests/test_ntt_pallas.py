"""Pallas NTT kernel vs the jnp reference — bit-exact (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from dilithium_tpu.params import Q
from dilithium_tpu.ops import ntt as ntt_ref
from dilithium_tpu.ops import ntt_pallas

RNG = np.random.default_rng(10)


def _rand(shape):
    return jnp.asarray(
        RNG.integers(0, Q, size=shape + (256,), dtype=np.int64).astype(np.uint32)
    )


@pytest.mark.parametrize("batch", [(4,), (300,), (3, 5)])
def test_fwd_matches_reference(batch):
    x = _rand(batch)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ntt_pallas.ntt(x))
    exp = np.asarray(ntt_ref.ntt(x))
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("from_product", [True, False])
def test_inv_matches_reference(from_product):
    x = _rand((8,))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ntt_pallas.invntt(x, from_product=from_product))
    exp = np.asarray(ntt_ref.invntt(x, from_product=from_product))
    np.testing.assert_array_equal(got, exp)


def test_roundtrip():
    x = _rand((16,))
    with pltpu.force_tpu_interpret_mode():
        y = ntt_pallas.invntt(ntt_pallas.ntt(x), from_product=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
