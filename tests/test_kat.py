"""KAT replay — keygen / sign / verify, byte-exact, levels 2/3/5.

Analog of the reference testbenches (`rtl_tb/tb_{keygen,sign,verify}_top.v`)
which replay NUM_TV=5 of the 100 shipped vectors per level; here the whole
selected set runs as ONE batched device call per operation. Set
DILITHIUM_KAT_COUNT=100 for the full corpus (default 25 — compile time
dominates the run, so more vectors are nearly free; the batch dim only
changes runtime, not code paths). The 100-vector corpus is run and
recorded once per round (docs/PERF.md).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dilithium_tpu import params, scheme
from dilithium_tpu.ops import pack
from dilithium_tpu.utils import kat

COUNT = int(os.environ.get("DILITHIUM_KAT_COUNT", "25"))
LEVELS = [2, 3, 5]


@pytest.fixture(scope="module", params=LEVELS)
def level_data(request):
    level = request.param
    p = params.get_params(level)
    k = kat.load_kat(level, count=COUNT)
    seed = jnp.asarray(kat.stack_u8(k["z"]))
    kp = scheme.keygen(seed, p)
    return level, p, k, kp


def test_keygen_components(level_data):
    level, p, k, kp = level_data
    np.testing.assert_array_equal(np.asarray(kp.rho), kat.stack_u8(k["rho"]))
    np.testing.assert_array_equal(np.asarray(kp.key), kat.stack_u8(k["k"]))
    np.testing.assert_array_equal(np.asarray(kp.tr), kat.stack_u8(k["tr"]))
    np.testing.assert_array_equal(
        np.asarray(pack.pack_eta(kp.s1, p)).reshape(COUNT, -1), kat.stack_u8(k["s1"])
    )
    np.testing.assert_array_equal(
        np.asarray(pack.pack_eta(kp.s2, p)).reshape(COUNT, -1), kat.stack_u8(k["s2"])
    )
    np.testing.assert_array_equal(
        np.asarray(pack.pack_t0(kp.t0)).reshape(COUNT, -1), kat.stack_u8(k["t0"])
    )
    np.testing.assert_array_equal(
        np.asarray(pack.pack_t1(kp.t1)).reshape(COUNT, -1), kat.stack_u8(k["t1"])
    )
    assert np.asarray(kp.ok).all()


def test_sk_pk_roundtrip(level_data):
    level, p, k, kp = level_data
    rho, key, tr, s1, s2, t0 = pack.unpack_sk(kp.sk, p)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(kp.s1))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(kp.s2))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(kp.t0))
    rho2, t1 = pack.unpack_pk(kp.pk, p)
    np.testing.assert_array_equal(np.asarray(rho2), np.asarray(kp.rho))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(kp.t1))


def _mus(k):
    return jnp.asarray(
        np.stack([kat.to_u8(kat.crh(tr, m)) for tr, m in zip(k["tr"], k["m"])])
    )


def test_sign_bit_exact(level_data):
    level, p, k, kp = level_data
    res = scheme.sign(kp.sk, _mus(k), p)
    assert np.asarray(res.ok).all()
    sig = np.asarray(res.sig)
    nz = p.L * p.polyz_packedbytes
    np.testing.assert_array_equal(sig[:, :32], kat.stack_u8(k["c"]))
    np.testing.assert_array_equal(sig[:, 32:32 + nz], kat.stack_u8(k["zs"]))
    np.testing.assert_array_equal(sig[:, 32 + nz:], kat.stack_u8(k["h"]))


def test_verify_accepts_kat_signatures(level_data):
    level, p, k, kp = level_data
    sigs = jnp.asarray(
        np.concatenate(
            [kat.stack_u8(k["c"]), kat.stack_u8(k["zs"]), kat.stack_u8(k["h"])], axis=1
        )
    )
    ok = scheme.verify(kp.pk, sigs, _mus(k), p)
    assert np.asarray(ok).all()
