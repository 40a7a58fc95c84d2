"""Bytes-level API tests: ragged messages, KAT cross-check, error paths."""

import numpy as np
import pytest

from dilithium_tpu import api, params
from dilithium_tpu.utils import kat

LEVEL = 2


@pytest.fixture(scope="module")
def kat2():
    return kat.load_kat(LEVEL, count=2)


def test_api_roundtrip_matches_kat(kat2):
    k = kat2
    pks, sks = api.keygen(LEVEL, k["z"])
    p = params.get_params(LEVEL)
    assert len(pks[0]) == p.pk_bytes and len(sks[0]) == p.sk_bytes
    assert pks[0][:32] == k["rho"][0]

    # one key, both KAT messages batched (ragged lengths)
    # KAT messages are per-key, so sign each key's own message
    for i in range(2):
        sigs = api.sign(LEVEL, sks[i], [k["m"][i]])
        expected = k["c"][i] + k["zs"][i] + k["h"][i]
        assert sigs[0] == expected
        assert api.verify(LEVEL, pks[i], [(k["m"][i], sigs[0])]) == [True]
        # wrong message / corrupted signature reject
        assert api.verify(LEVEL, pks[i], [(b"x" + k["m"][i], sigs[0])]) == [False]
        bad = bytearray(sigs[0]); bad[40] ^= 1
        assert api.verify(LEVEL, pks[i], [(k["m"][i], bytes(bad))]) == [False]


def test_signer_cached_expansion_matches(kat2):
    k = kat2
    _, sks = api.keygen(LEVEL, k["z"][:1])
    signer = api.Signer(LEVEL, sks[0])
    msgs = [b"hello", b"", b"a" * 1000]
    sigs1 = signer.sign(msgs)
    sigs2 = api.sign(LEVEL, sks[0], msgs)
    assert sigs1 == sigs2


def test_bad_lengths_raise(kat2):
    with pytest.raises(ValueError):
        api.keygen(LEVEL, [b"short"])
    with pytest.raises(ValueError):
        api.sign(LEVEL, b"\0" * 10, [b"m"])
    with pytest.raises(ValueError):
        api.verify(LEVEL, b"\0" * 10, [(b"m", b"s")])


def test_wrong_length_signature_rejects(kat2):
    k = kat2
    pks, sks = api.keygen(LEVEL, k["z"][:1])
    assert api.verify(LEVEL, pks[0], [(b"m", b"tiny")]) == [False]


def test_verifier_modes_match(kat2):
    """Verifier (cached expansion, both modes) must agree with api.verify."""
    k = kat2
    pks, sks = api.keygen(LEVEL, k["z"][:1])
    msgs = [k["m"][0], b"other", b""]
    sigs = api.Signer(LEVEL, sks[0]).sign(msgs)
    pairs = list(zip(msgs, sigs))
    bad_pairs = [(m + b"!", s) for m, s in pairs]
    for mode in ("batch", "mxu"):
        v = api.Verifier(LEVEL, pks[0], mode=mode)
        assert v.verify(pairs) == [True, True, True]
        assert v.verify(bad_pairs) == [False, False, False]
        assert v.verify([(b"m", b"tiny")]) == [False]


def test_expansion_cache_roundtrip(kat2, tmp_path):
    """Persisted key expansions (the checkpoint analog): a Signer/Verifier
    restarted from the cache file emits identical results; a cache written
    for a DIFFERENT key is ignored (digest mismatch -> recompute)."""
    k = kat2
    pks, sks = api.keygen(LEVEL, k["z"][:2])
    msgs = [b"alpha", b"beta"]
    for mode in ("batch", "mxu"):
        spath = str(tmp_path / f"sk_{mode}.npz")
        s1 = api.Signer(LEVEL, sks[0], mode=mode, cache_path=spath)
        sigs = s1.sign(msgs)
        assert (tmp_path / f"sk_{mode}.npz").exists()
        s2 = api.Signer(LEVEL, sks[0], mode=mode, cache_path=spath)
        assert s2.sign(msgs) == sigs
        # other key, same path: must NOT reuse the stale expansion
        s3 = api.Signer(LEVEL, sks[1], mode=mode, cache_path=spath)
        assert s3.sign(msgs) != sigs

        vpath = str(tmp_path / f"pk_{mode}.npz")
        v1 = api.Verifier(LEVEL, pks[0], mode=mode, cache_path=vpath)
        assert v1.verify(list(zip(msgs, sigs))) == [True, True]
        v2 = api.Verifier(LEVEL, pks[0], mode=mode, cache_path=vpath)
        assert v2.verify(list(zip(msgs, sigs))) == [True, True]
        v3 = api.Verifier(LEVEL, pks[1], mode=mode, cache_path=vpath)
        assert v3.verify(list(zip(msgs, sigs))) == [False, False]


def test_signer_mxu_mode_matches_batch(kat2):
    """Signer(mode="mxu") (dense-operator stream path) must emit the same
    signature bytes as the lockstep "batch" mode on any backend."""
    k = kat2
    _, sks = api.keygen(LEVEL, k["z"][:1])
    msgs = [k["m"][0], b"another message", b""]
    ref = api.Signer(LEVEL, sks[0], mode="batch").sign(msgs)
    got = api.Signer(LEVEL, sks[0], mode="mxu", window=2).sign(msgs)
    assert got == ref


def test_compute_mu_batch_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    tr = rng.integers(0, 256, 32, dtype=np.uint8)
    msgs = rng.integers(0, 256, (5, 217), dtype=np.uint8)
    dev = np.asarray(api.compute_mu_batch(jnp.asarray(tr), jnp.asarray(msgs)))
    for i in range(5):
        assert bytes(dev[i]) == api.compute_mu(tr.tobytes(), msgs[i].tobytes())


def test_randomized_signing(kat2):
    """randomized=True: signatures differ from deterministic (and between
    draws) but still verify — the round-3 spec's randomized variant
    (uniform rhoprime instead of CRH(K || mu))."""
    k = kat2
    pks, sks = api.keygen(LEVEL, k["z"][:1])
    msgs = [k["m"][0], b"fault-countermeasure test"]
    det = api.sign(LEVEL, sks[0], msgs)
    assert api.sign(LEVEL, sks[0], msgs) == det  # deterministic repeats
    r1 = api.sign(LEVEL, sks[0], msgs, randomized=True)
    r2 = api.sign(LEVEL, sks[0], msgs, randomized=True)
    assert r1 != det and r2 != det and r1 != r2  # P[collision] ~ 2^-512
    for sigs in (r1, r2):
        assert api.verify(LEVEL, pks[0], list(zip(msgs, sigs))) == [True, True]


def test_randomized_signer_service(kat2):
    k = kat2
    pks, sks = api.keygen(LEVEL, k["z"][:1])
    msgs = [b"m1", b"m2", b"m3"]
    for mode in ("batch", "mxu"):
        s = api.Signer(LEVEL, sks[0], mode=mode, window=2)
        det = s.sign(msgs)
        rnd = s.sign(msgs, randomized=True)
        assert rnd != det
        v = api.Verifier(LEVEL, pks[0], mode=mode)
        assert v.verify(list(zip(msgs, rnd))) == [True, True, True]


def test_multi_signer_matches_kat_and_single(kat2):
    """MultiSigner signs a mixed-key queue byte-identically to the KAT
    signatures / per-key api.sign, and signatures verify under the right
    key only."""
    k = kat2
    pks, sks = api.keygen(LEVEL, k["z"])
    ms = api.MultiSigner(LEVEL, sks, window=3)
    pairs = [(0, k["m"][0]), (1, k["m"][1]), (0, b"extra message"), (1, b"")]
    sigs = ms.sign(pairs)
    # KAT messages signed under their own key reproduce the KAT signature
    assert sigs[0] == k["c"][0] + k["zs"][0] + k["h"][0]
    assert sigs[1] == k["c"][1] + k["zs"][1] + k["h"][1]
    # non-KAT messages match the single-key path bit-for-bit
    assert sigs[2] == api.sign(LEVEL, sks[0], [b"extra message"])[0]
    assert sigs[3] == api.sign(LEVEL, sks[1], [b""])[0]
    # verify under the correct key; reject under the other
    assert api.verify(LEVEL, pks[0], [(b"extra message", sigs[2])]) == [True]
    assert api.verify(LEVEL, pks[1], [(b"extra message", sigs[2])]) == [False]
    # randomized variant still verifies
    rnd = ms.sign(pairs, randomized=True)
    assert rnd != sigs
    assert api.verify(LEVEL, pks[0], [(k["m"][0], rnd[0])]) == [True]
    with pytest.raises(IndexError):
        ms.sign([(2, b"no such key")])
