"""Negative tests: corrupted signatures / wrong keys / wrong messages reject.

Mirrors the reference verify testbench's reject path (`tb_verify_top.v`
prints "Rejected" when `data_o == 1`) and extends it: the RTL testbench
only checks well-formed signatures, we also fuzz every corruption class.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dilithium_tpu import params, scheme
from dilithium_tpu.utils import kat

LEVEL = 2
RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def ctx():
    p = params.get_params(LEVEL)
    k = kat.load_kat(LEVEL, count=2)
    seed = jnp.asarray(kat.stack_u8(k["z"]))
    kp = scheme.keygen(seed, p)
    mus = jnp.asarray(
        np.stack([kat.to_u8(kat.crh(tr, m)) for tr, m in zip(k["tr"], k["m"])])
    )
    sig = scheme.sign(kp.sk, mus, p).sig
    assert np.asarray(scheme.verify(kp.pk, sig, mus, p)).all()
    return p, kp, mus, np.asarray(sig)


def _ver(p, pk, sig, mus):
    return np.asarray(scheme.verify(pk, jnp.asarray(sig), mus, p))


def test_flip_any_region_rejects(ctx):
    p, kp, mus, sig = ctx
    nz = p.L * p.polyz_packedbytes
    # one corruption per region: c_tilde, z, hint positions, hint counts
    for off in [0, 31, 32, 32 + nz // 2, 32 + nz, 32 + nz + p.omega]:
        bad = sig.copy()
        bad[:, off] ^= 1
        assert not _ver(p, kp.pk, bad, mus).any(), f"byte {off} corruption accepted"


def test_wrong_message_rejects(ctx):
    p, kp, mus, sig = ctx
    bad_mus = jnp.asarray(np.asarray(mus) ^ 1)
    assert not _ver(p, kp.pk, sig, bad_mus).any()


def test_wrong_key_rejects(ctx):
    p, kp, mus, sig = ctx
    pk_sw = jnp.asarray(np.asarray(kp.pk)[::-1].copy())  # swap the two keys
    assert not _ver(p, pk_sw, sig, mus).any()


def test_oversize_z_rejects(ctx):
    """Set a z coefficient to exactly gamma1 - beta (norm boundary)."""
    p, kp, mus, sig = ctx
    bad = sig.copy()
    # z coeffs are packed as gamma1 - z in gamma1_bits LE; value 0 encodes
    # z = gamma1 (out of range even before beta margin)
    bad[:, 32:32 + p.gamma1_bits * 256 // 8] = 0
    assert not _ver(p, kp.pk, bad, mus).any()


def test_malformed_hint_padding_rejects(ctx):
    p, kp, mus, sig = ctx
    bad = sig.copy()
    bad[:, 32 + p.L * p.polyz_packedbytes + p.omega - 1] = 255  # junk in pad
    assert not _ver(p, kp.pk, bad, mus).any()


def test_random_bitflip_fuzz_rejects(ctx):
    """Any single flipped bit anywhere in the signature must reject —
    strong malleability sweep over 64 random (byte, bit) positions."""
    p, kp, mus, sig = ctx
    positions = RNG.integers(0, p.sig_bytes, size=64)
    bits = RNG.integers(0, 8, size=64)
    bad = np.repeat(sig[:1], 64, axis=0)
    for r, (off, b) in enumerate(zip(positions, bits)):
        bad[r, off] ^= 1 << b
    mus64 = jnp.broadcast_to(mus[0], (64,) + mus.shape[1:])
    pk64 = jnp.broadcast_to(kp.pk[0], (64,) + kp.pk.shape[1:])
    ok = _ver(p, pk64, bad, mus64)
    assert not ok.any(), f"bit flips accepted at rows {np.nonzero(ok)[0]}"


def test_all_zero_and_all_ones_sig_reject(ctx):
    p, kp, mus, sig = ctx
    for fill in (0x00, 0xFF):
        junk = np.full_like(sig, fill)
        assert not _ver(p, kp.pk, junk, mus).any()
