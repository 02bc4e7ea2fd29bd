"""RNG parity (vectorized jax vs scalar oracle) and distribution statistics."""

import numpy as np
import pytest

from vpt_tpu.ops import sampling
from vpt_tpu.reference import oracle


def test_pcg_hash_matches_oracle():
    xs = np.array([0, 1, 2, 12345, 0xFFFFFFFF, 0xDEADBEEF], np.uint32)
    got = np.asarray(sampling.pcg_hash(xs))
    want = np.array([oracle.pcg_hash(np.uint32(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hash3_matches_oracle():
    got = np.asarray(
        sampling.hash3(
            np.array([0, 5, 511], np.uint32),
            np.array([0, 7, 511], np.uint32),
            np.array([42, 42, 42], np.uint32),
        )
    )
    want = np.array([oracle.hash3(0, 0, 42), oracle.hash3(5, 7, 42), oracle.hash3(511, 511, 42)])
    np.testing.assert_array_equal(got, want)


def test_uniform_chain_matches_oracle():
    state0 = oracle.hash3(3, 4, 99)
    chain = oracle.Chain(state0)
    want = [chain.uniform() for _ in range(16)]

    s = np.full(1, state0, np.uint32)
    got = []
    mask = np.ones(1, bool)
    for _ in range(16):
        s, u = sampling.draw(s, mask)
        got.append(float(u[0]))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_masked_draw_freezes_state():
    s0 = np.array([123, 456], np.uint32)
    mask = np.array([True, False])
    s1, _ = sampling.draw(s0, mask)
    assert s1[0] != s0[0]
    assert s1[1] == s0[1]


def test_disk_sphere_match_oracle():
    state0 = oracle.hash3(10, 20, 7)
    chain = oracle.Chain(state0)
    want_disk = chain.disk()
    want_sphere = chain.sphere()

    s = np.full(1, state0, np.uint32)
    m = np.ones(1, bool)
    s, (dx, dy) = sampling.draw_disk(s, m)
    np.testing.assert_allclose([dx[0], dy[0]], want_disk, rtol=1e-6)
    s, (sx, sy, sz) = sampling.draw_sphere(s, m)
    np.testing.assert_allclose([sx[0], sy[0], sz[0]], want_sphere, rtol=1e-5, atol=1e-6)


def test_exponential_matches_oracle():
    state0 = np.uint32(777)
    chain = oracle.Chain(state0)
    want = chain.exponential(np.float32(2.5))
    s = np.full(1, state0, np.uint32)
    s, d = sampling.draw_exponential(s, np.ones(1, bool), np.float32(2.5))
    # XLA's log differs from libm by ~1 ulp-ish relative error
    assert d[0] == pytest.approx(float(want), rel=3e-5)


def test_hg_matches_oracle_anisotropic():
    state0 = oracle.hash3(1, 2, 3)
    g = 0.6
    direction = np.array([0.0, 0.0, 1.0], np.float32)
    chain = oracle.Chain(state0)
    want = oracle.sample_henyey_greenstein(chain, g, direction)

    s = np.full(1, state0, np.uint32)
    m = np.ones(1, bool)
    s, (ox, oy, oz) = sampling.draw_hg(
        s, m, np.full(1, g, np.float32),
        np.zeros(1, np.float32), np.zeros(1, np.float32), np.ones(1, np.float32),
    )
    np.testing.assert_allclose([ox[0], oy[0], oz[0]], want, rtol=1e-5, atol=1e-6)


def test_hg_isotropic_is_sphere_sample():
    """|g| < EPS must return the raw sphere sample and must NOT draw the
    cosine (draw-order parity)."""
    state0 = oracle.hash3(4, 4, 4)
    chain = oracle.Chain(state0)
    want = np.array(chain.sphere(), np.float32)
    state_after_sphere = chain.state

    s = np.full(1, state0, np.uint32)
    s, (ox, oy, oz) = sampling.draw_hg(
        s, np.ones(1, bool), np.zeros(1, np.float32),
        np.zeros(1, np.float32), np.zeros(1, np.float32), np.ones(1, np.float32),
    )
    np.testing.assert_allclose([ox[0], oy[0], oz[0]], want, rtol=1e-6)
    assert s[0] == state_after_sphere  # no extra draw happened


def test_hg_mean_cosine_statistic():
    """E[cos theta] for HG sampling equals g."""
    n = 200_000
    g = 0.4
    s = np.asarray(sampling.hash3(
        np.arange(n, dtype=np.uint32), np.zeros(n, np.uint32), np.full(n, 5, np.uint32)
    ))
    m = np.ones(n, bool)
    _, (ox, oy, oz) = sampling.draw_hg(
        s, m, np.full(n, g, np.float32),
        np.zeros(n, np.float32), np.zeros(n, np.float32), np.ones(n, np.float32),
    )
    mean_cos = float(np.mean(np.asarray(oz)))
    assert mean_cos == pytest.approx(g, abs=5e-3)


def test_sphere_is_uniform():
    n = 100_000
    s = np.asarray(sampling.hash3(
        np.arange(n, dtype=np.uint32), np.ones(n, np.uint32), np.full(n, 9, np.uint32)
    ))
    _, (x, y, z) = sampling.draw_sphere(s, np.ones(n, bool))
    x, y, z = map(np.asarray, (x, y, z))
    r = np.sqrt(x * x + y * y + z * z)
    np.testing.assert_allclose(r, 1.0, atol=1e-4)
    assert abs(x.mean()) < 5e-3 and abs(y.mean()) < 5e-3 and abs(z.mean()) < 5e-3
    # each coordinate of a uniform sphere direction is U(-1,1): var = 1/3
    assert z.var() == pytest.approx(1 / 3, abs=5e-3)


def test_uniform_is_uniform():
    n = 100_000
    s = np.asarray(sampling.hash3(
        np.arange(n, dtype=np.uint32), np.full(n, 3, np.uint32), np.full(n, 1, np.uint32)
    ))
    _, u = sampling.draw(s, np.ones(n, bool))
    u = np.asarray(u)
    assert 0 <= u.min() and u.max() <= 1
    assert u.mean() == pytest.approx(0.5, abs=5e-3)
    assert u.var() == pytest.approx(1 / 12, abs=1e-3)
