"""Keccak/SHAKE differential tests vs hashlib (FIPS-202 ground truth).

The reference validates its VHDL core only implicitly through scheme KATs;
here every XOF configuration the scheme uses (SURVEY.md §2.3 header-word
list) is tested directly against hashlib.
"""

import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from dilithium_tpu.ops import keccak

RNG = np.random.default_rng(2)


@pytest.mark.parametrize("msg_len", [0, 1, 32, 34, 66, 135, 136, 137, 168, 500])
@pytest.mark.parametrize("out_bytes,fn,href", [
    (32, keccak.shake256, hashlib.shake_256),
    (64, keccak.shake256, hashlib.shake_256),
    (128, keccak.shake256, hashlib.shake_256),
    (840, keccak.shake128, hashlib.shake_128),
    (272, keccak.shake256, hashlib.shake_256),
])
def test_shake_matches_hashlib(msg_len, out_bytes, fn, href):
    msgs = RNG.integers(0, 256, size=(3, msg_len), dtype=np.uint8)
    got = np.asarray(fn(jnp.asarray(msgs), out_bytes))
    for i in range(3):
        exp = np.frombuffer(href(msgs[i].tobytes()).digest(out_bytes), dtype=np.uint8)
        np.testing.assert_array_equal(got[i], exp, err_msg=f"lane {i}")


@pytest.mark.parametrize("msg_len", [0, 1, 32, 71, 72, 73, 135, 136, 137, 300])
@pytest.mark.parametrize("fn,href", [
    (keccak.sha3_256, hashlib.sha3_256),
    (keccak.sha3_512, hashlib.sha3_512),
])
def test_sha3_matches_hashlib(msg_len, fn, href):
    """SHA3 fixed-output modes (reference core mode bits 00/01,
    `keccak_datapath.vhd:92-131`) vs hashlib."""
    msgs = RNG.integers(0, 256, size=(3, msg_len), dtype=np.uint8)
    got = np.asarray(fn(jnp.asarray(msgs)))
    for i in range(3):
        exp = np.frombuffer(href(msgs[i].tobytes()).digest(), dtype=np.uint8)
        np.testing.assert_array_equal(got[i], exp, err_msg=f"lane {i}")


def test_keccak_f1600_zero_state():
    """Permutation of the zero state — classic known-answer vector."""
    st = jnp.zeros((25, 2), dtype=jnp.uint32)
    out = np.asarray(keccak.keccak_f1600(st))
    lanes = out[:, 0].astype(np.uint64) | (out[:, 1].astype(np.uint64) << 32)
    # First lane of Keccak-f[1600] applied to the all-zero state
    assert lanes[0] == 0xF1258F7940E1DDE7
    assert lanes[1] == 0x84D5CCF933C0478A
    assert lanes[24] == 0xEAF1FF7B5CECA249


def test_batched_shapes():
    msgs = RNG.integers(0, 256, size=(2, 5, 34), dtype=np.uint8)
    got = np.asarray(keccak.shake128(jnp.asarray(msgs), 168))
    assert got.shape == (2, 5, 168)
    for i in range(2):
        for j in range(5):
            exp = np.frombuffer(
                hashlib.shake_128(msgs[i, j].tobytes()).digest(168), dtype=np.uint8
            )
            np.testing.assert_array_equal(got[i, j], exp)
