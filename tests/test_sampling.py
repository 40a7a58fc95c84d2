"""Sampler semantics tests — distributions, determinism, budget flags.

The samplers' bit-exactness vs the reference streaming semantics is pinned
end-to-end by the KAT replay (test_kat.py); these tests check the
self-contained invariants (`rejection_a.v`, `rejection_s.v`,
`rejection_y.v`, `gen_c.v` SampleInBall).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dilithium_tpu.params import Q, N, get_params
from dilithium_tpu.ops import sampling
from dilithium_tpu.ops.reduce import center

RNG = np.random.default_rng(6)


def _seeds(n, length=32):
    return jnp.asarray(RNG.integers(0, 256, size=(n, length), dtype=np.uint8))


def test_rank_compact_sparse_matches_scatter():
    """Sparse (shifted compare-select) compaction == general scatter
    compaction on random masks within the skip budget."""
    cand = jnp.asarray(RNG.integers(0, 1 << 23, size=(64, 336), dtype=np.int64).astype(np.uint32))
    accept = cand < jnp.uint32(Q)  # ~1e-3 reject rate
    ref, ok_ref = sampling._rank_compact(cand, accept, 256)
    got, ok_got = sampling._rank_compact_sparse(cand, accept, 256, max_skips=12)
    assert np.asarray(ok_ref).all() and np.asarray(ok_got).all()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rank_compact_sparse_skip_budget_edges():
    """Coverage flag semantics: exactly max_skips rejects in the window is
    still exact; one more reject before the last needed slot trips ok
    False (never a silently wrong value)."""
    n_cand, n_out, S = 300, 256, 8
    base = np.arange(n_cand, dtype=np.uint32) + 1  # all nonzero, accepted
    for n_rej in (S, S + 1):
        cand = base.copy()
        cand[:n_rej] = 0  # rejected candidates at the front
        accept = cand != 0
        expect = base[n_rej:n_rej + n_out]
        got, ok = sampling._rank_compact_sparse(
            jnp.asarray(cand[None]), jnp.asarray(accept[None]), n_out, max_skips=S
        )
        if n_rej <= S:
            assert np.asarray(ok).all()
            np.testing.assert_array_equal(np.asarray(got)[0], expect)
        else:
            assert not np.asarray(ok).any()


def test_rank_compact_banded_matches_onehot():
    """Banded one-hot compaction == full-window one-hot at the eta=4
    acceptance rate (9/16), including the coverage/ok semantics."""
    nib = jnp.asarray(RNG.integers(0, 16, size=(128, 11, 816), dtype=np.int64).astype(np.uint8))
    accept = nib < 9
    ref, ok_ref = sampling._rank_compact_onehot(nib, accept, 256)
    got, ok_got = sampling._rank_compact_onehot_banded(
        nib, accept, 256, p_accept=9 / 16
    )
    assert np.asarray(ok_ref).all() and np.asarray(ok_got).all()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rank_compact_banded_flags_out_of_band():
    """A draw whose source falls outside the sigma band must flag
    ok=False, never return a wrong value: front-load far more rejects
    than the band allows."""
    n_cand = 816
    cand = np.arange(1, n_cand + 1, dtype=np.uint32)
    accept = np.ones(n_cand, dtype=bool)
    accept[:500] = False  # 500 rejects up front >> 8-sigma band
    got, ok = sampling._rank_compact_onehot_banded(
        jnp.asarray(cand[None]), jnp.asarray(accept[None]), 256, p_accept=9 / 16
    )
    assert not np.asarray(ok).any()


@pytest.mark.parametrize("level", [2, 3, 5])
def test_expand_a_range_and_determinism(level):
    p = get_params(level)
    rho = _seeds(2)
    a1, ok1 = sampling.expand_a(rho, p)
    a2, ok2 = sampling.expand_a(rho, p)
    assert a1.shape == (2, p.K, p.L, N)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.asarray(ok1).all()
    a = np.asarray(a1)
    assert a.max() < Q
    # distinct (i, j) entries differ (nonce separation)
    assert not np.array_equal(a[:, 0, 0], a[:, 0, 1])
    assert not np.array_equal(a[:, 0, 0], a[:, 1, 0])


@pytest.mark.parametrize("level", [2, 3, 5])
def test_expand_s_bounds(level):
    p = get_params(level)
    sigma = _seeds(2, 64)
    s1, ok = sampling.expand_s(sigma, 0, p.L, p)
    assert np.asarray(ok).all()
    c = np.asarray(center(s1))
    assert c.min() >= -p.eta and c.max() <= p.eta
    # nonce separation from s2
    s2, _ = sampling.expand_s(sigma, p.L, p.K, p)
    assert not np.array_equal(np.asarray(s1)[:, 0], np.asarray(s2)[:, 0])


@pytest.mark.parametrize("level", [2, 3, 5])
def test_expand_mask_bounds_and_kappa(level):
    p = get_params(level)
    rhop = _seeds(3, 64)
    k0 = jnp.zeros((3,), dtype=jnp.uint32)
    y0 = sampling.expand_mask(rhop, k0, p)
    c = np.asarray(center(y0))
    assert c.min() >= -p.gamma1 + 1 and c.max() <= p.gamma1
    # kappa + L must give fresh polys, and poly l of kappa=L equals poly 0's
    # nonce collision structure: nonce(kappa, l) = kappa + l
    yL = sampling.expand_mask(rhop, k0 + jnp.uint32(p.L), p)
    assert not np.array_equal(np.asarray(y0), np.asarray(yL))
    y1 = sampling.expand_mask(rhop, k0 + jnp.uint32(1), p)
    np.testing.assert_array_equal(np.asarray(y0)[:, 1], np.asarray(y1)[:, 0])


def _sample_in_ball_serial(c_tilde: bytes, p):
    """Straightforward serial SampleInBall (round-3 spec / gen_c.v walk)."""
    import hashlib

    stream = hashlib.shake_256(c_tilde).digest(p.ball_blocks * 136)
    signs = int.from_bytes(stream[:8], "little")
    c = np.zeros(256, dtype=np.uint64)
    pos = 8
    for i in range(256 - p.tau, 256):
        while True:
            j = stream[pos]
            pos += 1
            if j <= i:
                break
        c[i] = c[j]
        c[j] = Q - 1 if (signs & 1) else 1
        signs >>= 1
    return c.astype(np.uint32)


@pytest.mark.parametrize("level", [2, 3, 5])
def test_sample_in_ball(level):
    p = get_params(level)
    ct = _seeds(4)
    c, ok = sampling.sample_in_ball(ct, p)
    assert np.asarray(ok).all()
    c = np.asarray(c)
    # exactly tau nonzero coefficients, all in {1, q-1}
    nz = (c != 0).sum(axis=-1)
    np.testing.assert_array_equal(nz, p.tau)
    vals = c[c != 0]
    assert set(np.unique(vals)) <= {1, Q - 1}


@pytest.mark.parametrize("level", [2, 3, 5])
def test_sample_in_ball_matches_serial(level):
    """The chunked-walk vector form == the serial spec walk, per byte."""
    p = get_params(level)
    ct = np.asarray(_seeds(16))
    c = np.asarray(sampling.sample_in_ball(jnp.asarray(ct), p)[0])
    for lane in range(16):
        exp = _sample_in_ball_serial(ct[lane].tobytes(), p)
        np.testing.assert_array_equal(c[lane], exp, err_msg=f"lane {lane}")


def test_debug_check_ok_guard(monkeypatch):
    """DILITHIUM_DEBUG_CHECKS=1 surfaces a budget miss on flag-discarding
    paths as a host-side error; unset, the guard traces to nothing."""
    import jax

    ok_bad = jnp.asarray([True, False])
    # unset: no-op even for a False flag
    monkeypatch.delenv("DILITHIUM_DEBUG_CHECKS", raising=False)
    sampling.debug_check_ok(ok_bad, "noop")
    # set: raises through the jitted computation
    monkeypatch.setenv("DILITHIUM_DEBUG_CHECKS", "1")

    @jax.jit
    def f(ok):
        sampling.debug_check_ok(ok, "unit-test")
        return ok

    with pytest.raises(Exception, match="unit-test"):
        jax.block_until_ready(f(ok_bad))
    # all-ok passes clean
    jax.block_until_ready(f(jnp.asarray([True, True])))


def test_rank_compact_logshift_matches_scatter():
    """Log-shift displacement compaction == general scatter compaction at
    every rate, including adversarial tails and shortfalls."""
    for p_acc in (0.05, 0.3, 9 / 16, 0.9, 0.999):
        acc = jnp.asarray(RNG.random((32, 816)) < p_acc)
        c = jnp.asarray(
            RNG.integers(0, 1 << 20, size=(32, 816), dtype=np.int64).astype(np.uint32)
        )
        ref, okr = sampling._rank_compact(c, acc, 256)
        got, okg = sampling._rank_compact_logshift(c, acc, 256)
        m = np.asarray(okr)
        np.testing.assert_array_equal(np.asarray(got)[m], np.asarray(ref)[m])
        np.testing.assert_array_equal(np.asarray(okg), np.asarray(okr))
    # all accepts at the very end: max displacement = n_cand - n_out
    c3 = np.zeros((1, 600), dtype=np.uint8)
    c3[0, -256:] = 5
    g3, ok3 = sampling._rank_compact_logshift(jnp.asarray(c3), jnp.asarray(c3 == 5), 256)
    np.testing.assert_array_equal(np.asarray(g3)[0], np.full(256, 5))
    assert bool(np.asarray(ok3)[0])
    # shortfall (255 accepts) -> ok False, never silently wrong
    c4 = np.zeros((1, 600), dtype=np.uint8)
    c4[0, :255] = 7
    _, ok4 = sampling._rank_compact_logshift(jnp.asarray(c4), jnp.asarray(c4 == 7), 256)
    assert not bool(np.asarray(ok4)[0])


def test_rank_compact_logshift_packed_matches_scatter():
    """Packed (value-in-displacement-word) log-shift == scatter oracle at
    the production eta shapes, with and without 8-sigma truncation."""
    for n_cand, thr, p_acc in ((816, 9, 9 / 16), (544, 15, 15 / 16)):
        cand = jnp.asarray(RNG.integers(0, 16, size=(512, n_cand), dtype=np.uint8))
        accept = cand < thr
        ref, okr = sampling._rank_compact(cand, accept, 256)
        for p_trunc in (None, p_acc):
            got, okg = sampling._rank_compact_logshift_packed(
                cand, accept, 256, val_bits=4, p_accept=p_trunc
            )
            m = np.asarray(okr) & np.asarray(okg)
            np.testing.assert_array_equal(
                np.asarray(got).astype(np.uint8)[m], np.asarray(ref)[m]
            )
            # at production rates the truncated window never misses here
            assert np.asarray(okg).all()
    # shortfall flags
    c = np.zeros((1, 816), dtype=np.uint8)
    c[0, :255] = 7
    _, ok = sampling._rank_compact_logshift_packed(
        jnp.asarray(c), jnp.asarray(c == 7), 256, val_bits=4, p_accept=9 / 16
    )
    assert not bool(np.asarray(ok)[0])
