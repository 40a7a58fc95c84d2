"""Pallas Keccak kernel vs the jnp SoA path — bit-exact.

Runs on a real TPU only: Pallas interpret mode is impractically slow for a
fully-unrolled 24-round permutation (the CPU suite covers the jnp path via
tests/test_keccak.py; the Pallas path is additionally pinned on hardware by
every KAT replay and bench run, which go through shake()'s auto dispatch).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dilithium_tpu.ops import keccak

tpu_only = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a TPU (no interpret mode)"
)

RNG = np.random.default_rng(11)


@tpu_only
@pytest.mark.parametrize("sb", [1, 8, 9])
def test_f1600_folded_matches_soa(sb):
    from dilithium_tpu.ops import keccak_pallas

    planes = RNG.integers(0, 1 << 32, size=(50, sb, 128), dtype=np.uint64).astype(
        np.uint32
    )
    state = jnp.asarray(planes)
    got = np.asarray(keccak_pallas.f1600_folded(state))
    lo, hi = keccak._f1600_soa(
        [state[k] for k in range(25)], [state[25 + k] for k in range(25)]
    )
    exp = np.stack([np.asarray(x) for x in lo] + [np.asarray(x) for x in hi])
    np.testing.assert_array_equal(got, exp)


@tpu_only
def test_shake_pallas_impl_matches_hashlib(monkeypatch):
    import hashlib

    monkeypatch.setattr(keccak, "_IMPL", "pallas")
    msgs = RNG.integers(0, 256, size=(130, 66), dtype=np.uint8)
    got = np.asarray(keccak.shake256(jnp.asarray(msgs), 200))
    for i in (0, 17, 129):
        exp = np.frombuffer(
            hashlib.shake_256(msgs[i].tobytes()).digest(200), dtype=np.uint8
        )
        np.testing.assert_array_equal(got[i], exp, err_msg=f"lane {i}")


@tpu_only
@pytest.mark.parametrize("msg_len,out_words,rate", [
    (34, 252, 168),   # ExpandA shape
    (66, 160, 136),   # ExpandMask shape
    (832, 8, 136),    # c_tilde shape (mu || w1, level 3)
])
def test_fused_xof_matches_hashlib(msg_len, out_words, rate):
    import hashlib

    msgs = RNG.integers(0, 256, size=(137, msg_len), dtype=np.uint8)
    got = np.asarray(keccak._shake_words_fused(jnp.asarray(msgs), out_words, rate))
    h = hashlib.shake_128 if rate == 168 else hashlib.shake_256
    for i in (0, 17, 136):
        exp = np.frombuffer(
            h(msgs[i].tobytes()).digest(out_words * 4), dtype=np.uint32
        )
        np.testing.assert_array_equal(got[i], exp, err_msg=f"lane {i}")


@tpu_only
def test_sha3_pallas_impl_matches_hashlib(monkeypatch):
    """SHA3 fixed-output modes through the fused kernel (domain 0x06)."""
    import hashlib

    monkeypatch.setattr(keccak, "_IMPL", "pallas")
    for fn, href, mlen in (
        (keccak.sha3_256, hashlib.sha3_256, 135),
        (keccak.sha3_512, hashlib.sha3_512, 73),
    ):
        msgs = RNG.integers(0, 256, size=(130, mlen), dtype=np.uint8)
        got = np.asarray(fn(jnp.asarray(msgs)))
        for i in (0, 17, 129):
            exp = np.frombuffer(href(msgs[i].tobytes()).digest(), dtype=np.uint8)
            np.testing.assert_array_equal(got[i], exp, err_msg=f"lane {i}")


@tpu_only
@pytest.mark.parametrize("level", [2, 3, 5])
def test_ball_pallas_matches_jnp(level, monkeypatch):
    from dilithium_tpu.params import get_params
    from dilithium_tpu.ops import sampling

    p = get_params(level)
    ct = jnp.asarray(RNG.integers(0, 256, size=(300, 32), dtype=np.uint8))
    monkeypatch.setattr(keccak, "_IMPL", "pallas")
    c_p, ok_p = sampling.sample_in_ball(ct, p)
    monkeypatch.setattr(keccak, "_IMPL", "jnp")
    c_j, ok_j = sampling.sample_in_ball(ct, p)
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_j))
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_j))
    assert np.asarray(ok_p).all()
