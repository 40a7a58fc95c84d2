"""Codec roundtrips + hint-codec canonicity, all levels.

Byte layouts are additionally pinned against the KAT component files in
test_kat.py; here we check algebraic roundtrips and the reject paths of
the hint decoder (`usehint.v` RECEIVE/EXPAND; `makehint.v:104-148`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dilithium_tpu.params import Q, N, D, get_params
from dilithium_tpu.ops import pack
from dilithium_tpu.ops.reduce import uncenter

RNG = np.random.default_rng(4)


@pytest.mark.parametrize("bits", [3, 4, 6, 10, 13, 18, 20])
def test_bits_roundtrip(bits):
    vals = RNG.integers(0, 1 << bits, size=(5, 256), dtype=np.uint32)
    b = pack.pack_bits(jnp.asarray(vals), bits)
    assert b.shape == (5, 256 * bits // 8)
    back = np.asarray(pack.unpack_bits(b, bits))
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("level", [2, 3, 5])
def test_eta_roundtrip(level):
    p = get_params(level)
    s = uncenter(jnp.asarray(RNG.integers(-p.eta, p.eta + 1, size=(3, 256)).astype(np.int32)))
    back = np.asarray(pack.unpack_eta(pack.pack_eta(s, p), p))
    np.testing.assert_array_equal(back, np.asarray(s))


def test_t_roundtrips():
    t1 = RNG.integers(0, 1 << 10, size=(4, 256), dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(pack.unpack_t1(pack.pack_t1(jnp.asarray(t1)))), t1)
    t0 = RNG.integers(-(1 << (D - 1)) + 1, (1 << (D - 1)) + 1, size=(4, 256)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(pack.unpack_t0(pack.pack_t0(jnp.asarray(t0)))), t0)


@pytest.mark.parametrize("level", [2, 3, 5])
def test_z_roundtrip(level):
    p = get_params(level)
    z = uncenter(jnp.asarray(
        RNG.integers(-p.gamma1 + 1, p.gamma1 + 1, size=(3, 256)).astype(np.int32)
    ))
    back = np.asarray(pack.unpack_z(pack.pack_z(z, p), p))
    np.testing.assert_array_equal(back, np.asarray(z))


@pytest.mark.parametrize("level", [2, 3, 5])
def test_hint_roundtrip(level):
    p = get_params(level)
    for trial in range(8):
        nh = int(RNG.integers(0, p.omega + 1))
        h = np.zeros((p.K, N), dtype=np.uint32)
        flat = RNG.choice(p.K * N, size=nh, replace=False)
        h.reshape(-1)[flat] = 1
        b = pack.pack_hints(jnp.asarray(h), p)
        assert b.shape == (p.omega + p.K,)
        back, ok = pack.unpack_hints(b, p)
        assert bool(np.asarray(ok)), f"trial {trial}: canonical encoding rejected"
        np.testing.assert_array_equal(np.asarray(back), h)


@pytest.mark.parametrize("level", [2, 3, 5])
def test_hint_decoder_rejects_malformed(level):
    p = get_params(level)
    h = np.zeros((p.K, N), dtype=np.uint32)
    h[0, [3, 10, 200]] = 1
    h[p.K - 1, [7]] = 1
    good = np.asarray(pack.pack_hints(jnp.asarray(h), p))

    # count > omega
    bad = good.copy(); bad[p.omega + p.K - 1] = p.omega + 1
    assert not bool(np.asarray(pack.unpack_hints(jnp.asarray(bad), p)[1]))
    # decreasing cumulative counts
    bad = good.copy(); bad[p.omega] = p.omega  # first poly count > later counts
    assert not bool(np.asarray(pack.unpack_hints(jnp.asarray(bad), p)[1]))
    # non-increasing positions within a poly
    bad = good.copy(); bad[0], bad[1] = good[1], good[0]
    assert not bool(np.asarray(pack.unpack_hints(jnp.asarray(bad), p)[1]))
    # nonzero padding after last hint
    bad = good.copy(); bad[p.omega - 1] = 77
    assert not bool(np.asarray(pack.unpack_hints(jnp.asarray(bad), p)[1]))


@pytest.mark.parametrize("level", [2, 3, 5])
def test_container_sizes(level):
    p = get_params(level)
    # Round-3 v3.1 sizes with 32-byte tr (`combined_top.v:980` — 256-bit tr;
    # FIPS-204 would have sk 32 bytes larger per level from its 64-byte tr)
    expected = {
        2: (1312, 2528, 2420),
        3: (1952, 4000, 3293),
        5: (2592, 4864, 4595),
    }[level]
    assert (p.pk_bytes, p.sk_bytes, p.sig_bytes) == expected
