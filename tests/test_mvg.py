import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.ops import mvg
from vplines_slam_tpu.utils import geometry as geo


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def two_view_scene(rng, n=40, noise=0.0):
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    w = rng.standard_normal(3) * 0.1
    R = np.asarray(geo.so3_exp_matrix(jnp.asarray(w)))
    t = np.array([0.4, -0.15, 0.1])
    x1 = X[:, :2] / X[:, 2:3]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    if noise:
        x1 = x1 + rng.standard_normal(x1.shape) * noise
        x2 = x2 + rng.standard_normal(x2.shape) * noise
    return jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(R), jnp.asarray(t), jnp.asarray(X)


def test_eight_point_epipolar_constraint(rng):
    x1, x2, R, t, X = two_view_scene(rng)
    mask = jnp.ones(x1.shape[0], bool)
    E = mvg.eight_point_essential(x1, x2, mask)
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)
    viol = jnp.abs(jnp.sum(h2 * (h1 @ E.T), axis=-1))
    assert float(jnp.max(viol)) < 1e-10


def test_decompose_essential_recovers_pose(rng):
    x1, x2, R, t, X = two_view_scene(rng)
    mask = jnp.ones(x1.shape[0], bool)
    E = mvg.eight_point_essential(x1, x2, mask)
    R_est, t_est, votes = mvg.decompose_essential(E, x1, x2, mask)
    assert int(votes) == x1.shape[0]
    np.testing.assert_allclose(R_est, R, atol=1e-8)
    np.testing.assert_allclose(t_est, t / np.linalg.norm(t), atol=1e-8)


def test_masked_rows_do_not_affect_essential(rng):
    x1, x2, R, t, X = two_view_scene(rng)
    mask = jnp.ones(x1.shape[0], bool)
    E0 = mvg.eight_point_essential(x1, x2, mask)
    # corrupt masked-out rows
    x1b = jnp.concatenate([x1, jnp.asarray(rng.standard_normal((5, 2)) * 10)])
    x2b = jnp.concatenate([x2, jnp.asarray(rng.standard_normal((5, 2)) * 10)])
    maskb = jnp.concatenate([mask, jnp.zeros(5, bool)])
    E1 = mvg.eight_point_essential(x1b, x2b, maskb)
    s = jnp.sign(E0[2, 2] * E1[2, 2])
    np.testing.assert_allclose(E1 * s, E0, atol=1e-9)


def test_triangulate_two_view(rng):
    x1, x2, R, t, X = two_view_scene(rng)
    X_est, z = mvg.triangulate_two_view(R, t, x1, x2)
    np.testing.assert_allclose(X_est, X, atol=1e-8)
    assert bool(jnp.all(z > 0))


def test_triangulate_tracks_multi_view(rng):
    n, F = 30, 5
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    Rs, ts, obs = [], [], []
    for f in range(F):
        w = rng.standard_normal(3) * 0.05
        R = np.asarray(geo.so3_exp_matrix(jnp.asarray(w)))
        t = rng.standard_normal(3) * 0.3
        Xc = X @ R.T + t
        obs.append(Xc[:, :2] / Xc[:, 2:3])
        Rs.append(R)
        ts.append(t)
    obs = jnp.asarray(np.stack(obs, axis=1))  # [n, F, 2]
    mask = jnp.asarray(rng.uniform(size=(n, F)) > 0.3)
    mask = mask.at[:, 0].set(True).at[:, 1].set(True)  # ensure ≥2 views
    X_est, ok = mvg.triangulate_tracks(jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)), obs, mask)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(X_est, X, atol=1e-7)


def test_pnp_dlt_and_refine(rng):
    n = 30
    X = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3)))
    R_true = geo.so3_exp_matrix(jnp.asarray([0.2, -0.1, 0.3]))
    t_true = jnp.asarray([0.5, 0.2, -0.3])
    Xc = jax.vmap(lambda p: R_true @ p + t_true)(X)
    x = Xc[:, :2] / Xc[:, 2:3]
    mask = jnp.ones(n, bool)
    R0, t0, ok = mvg.pnp_dlt(X, x, mask)
    assert bool(ok)
    np.testing.assert_allclose(R0, R_true, atol=1e-6)
    np.testing.assert_allclose(t0, t_true, atol=1e-6)
    # refinement tightens a noisy start
    R1, t1 = mvg.pnp_refine(R0, t0 + 0.01, X, x, mask)
    np.testing.assert_allclose(t1, t_true, atol=1e-9)


def test_ransac_essential_rejects_outliers(rng):
    x1, x2, R, t, X = two_view_scene(rng, n=60)
    # corrupt 15 correspondences
    x2_bad = np.asarray(x2).copy()
    bad = rng.choice(60, size=15, replace=False)
    x2_bad[bad] += rng.standard_normal((15, 2)) * 0.2
    mask = jnp.ones(60, bool)
    key = jax.random.PRNGKey(0)
    E, inl, n_inl = mvg.ransac_essential(x1, jnp.asarray(x2_bad), mask, key)
    good = np.setdiff1d(np.arange(60), bad)
    # all clean correspondences kept, all corrupted dropped
    assert int(n_inl) >= len(good) - 2
    assert not bool(jnp.any(inl[jnp.asarray(bad)]))
    R_est, t_est, _ = mvg.decompose_essential(E, x1, jnp.asarray(x2_bad), inl)
    np.testing.assert_allclose(R_est, R, atol=2e-3)
