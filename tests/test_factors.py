import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.factors import residuals as res
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import plucker as plk


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def random_pose(rng, scale=1.0):
    q = geo.so3_exp_quat(jnp.asarray(rng.standard_normal(3)) * 0.3)
    p = jnp.asarray(rng.standard_normal(3)) * scale
    return q, p


def make_point_setup(rng):
    """A world point seen from two body poses through an extrinsic."""
    q_i, p_i = random_pose(rng)
    q_j, p_j = random_pose(rng)
    q_ic = geo.so3_exp_quat(jnp.asarray([0.01, -0.02, 1.55]))
    p_ic = jnp.asarray([0.05, 0.02, 0.0])
    X_w = jnp.asarray([1.0, -0.5, 6.0])

    def cam_coords(q_b, p_b):
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_b, p_b, q_ic, p_ic))
        return geo.transform_point(q_cw, p_cw, X_w)

    Xc_i = cam_coords(q_i, p_i)
    Xc_j = cam_coords(q_j, p_j)
    obs_i = Xc_i / Xc_i[2]
    obs_j = Xc_j / Xc_j[2]
    inv_dep = 1.0 / Xc_i[2]
    return (p_i, q_i, p_j, q_j, p_ic, q_ic, inv_dep, obs_i, obs_j)


def test_point_residual_zero_at_truth(rng):
    args = make_point_setup(rng)
    r = res.point_reprojection(*args)
    np.testing.assert_allclose(r, np.zeros(2), atol=1e-12)


def test_point_residual_detects_depth_error(rng):
    p_i, q_i, p_j, q_j, p_ic, q_ic, inv_dep, obs_i, obs_j = make_point_setup(rng)
    r = res.point_reprojection(p_i, q_i, p_j, q_j, p_ic, q_ic, inv_dep * 1.2, obs_i, obs_j)
    assert float(jnp.linalg.norm(r)) > 1e-4


def test_point_residual_jacobian_finite_diff(rng):
    """Autodiff jacobian wrt all inputs must match central finite differences —
    the same check the reference left commented out in its factors."""
    p_i, q_i, p_j, q_j, p_ic, q_ic, inv_dep, obs_i, obs_j = make_point_setup(rng)

    def f(delta):
        # perturb pose i on its manifold + depth
        q = geo.quat_mul(q_i, geo.so3_exp_quat(delta[0:3]))
        p = p_i + delta[3:6]
        d = inv_dep + delta[6]
        return res.point_reprojection(p, q, p_j, q_j, p_ic, q_ic, d, obs_i, obs_j)

    J = jax.jacfwd(f)(jnp.zeros(7))
    eps = 1e-6
    for k in range(7):
        e = jnp.zeros(7).at[k].set(eps)
        fd = (f(e) - f(-e)) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-6)


def test_tangent_basis_orthonormal(rng):
    ray = jnp.asarray([0.3, -0.2, 1.0])
    b1, b2 = res.tangent_basis(ray)
    for b in (b1, b2):
        assert abs(float(jnp.linalg.norm(b)) - 1) < 1e-12
        assert abs(float(jnp.dot(b, ray / jnp.linalg.norm(ray)))) < 1e-12
    assert abs(float(jnp.dot(b1, b2))) < 1e-12


def make_line_setup(rng):
    """A world segment seen from a body pose through an extrinsic."""
    q_i, p_i = random_pose(rng, scale=0.5)
    q_ic = geo.so3_exp_quat(jnp.asarray([0.0, 0.0, 1.57]))
    p_ic = jnp.asarray([0.05, 0.02, 0.0])
    A = jnp.asarray([1.0, 0.6, 5.0])
    B = jnp.asarray([-0.5, 0.9, 6.0])
    # world plucker from the two endpoints
    v = (B - A) / jnp.linalg.norm(B - A)
    n = jnp.cross(A, v)
    orth = plk.plk_to_orth(jnp.concatenate([n, v]))

    q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_i, p_i, q_ic, p_ic))
    Ac = geo.transform_point(q_cw, p_cw, A)
    Bc = geo.transform_point(q_cw, p_cw, B)
    obs = jnp.asarray([Ac[0] / Ac[2], Ac[1] / Ac[2], Bc[0] / Bc[2], Bc[1] / Bc[2]])
    return p_i, q_i, p_ic, q_ic, orth, obs, v


def test_line_residual_zero_at_truth(rng):
    p_i, q_i, p_ic, q_ic, orth, obs, _ = make_line_setup(rng)
    r = res.line_reprojection(p_i, q_i, p_ic, q_ic, orth, obs)
    np.testing.assert_allclose(r, np.zeros(2), atol=1e-9)


def test_line_residual_is_pixel_distance(rng):
    """Shifting one observed endpoint off the line by d in the normal direction
    changes that endpoint's residual to ±d (point-line distance)."""
    p_i, q_i, p_ic, q_ic, orth, obs, _ = make_line_setup(rng)
    # line normal on the normalized plane from the other endpoint
    d = 0.02
    # perturb endpoint 1 along the image-plane normal of the projected line
    r0 = res.line_reprojection(p_i, q_i, p_ic, q_ic, orth, obs)
    # compute projected line normal numerically: gradient of e1 wrt obs[0:2]
    g = jax.grad(lambda o: res.line_reprojection(p_i, q_i, p_ic, q_ic, orth, o)[0])(obs)
    n2 = g[0:2] / jnp.linalg.norm(g[0:2])
    obs_shift = obs.at[0:2].add(n2 * d)
    r1 = res.line_reprojection(p_i, q_i, p_ic, q_ic, orth, obs_shift)
    assert abs(abs(float(r1[0] - r0[0])) - d) < 1e-6


def test_line_residual_jacobian_finite_diff(rng):
    p_i, q_i, p_ic, q_ic, orth, obs, _ = make_line_setup(rng)

    def f(delta):
        q = geo.quat_mul(q_i, geo.so3_exp_quat(delta[0:3]))
        p = p_i + delta[3:6]
        o = plk.orth_boxplus(orth, delta[6:10])
        return res.line_reprojection(p, q, p_ic, q_ic, o, obs)

    J = jax.jacfwd(f)(jnp.zeros(10))
    eps = 1e-6
    for k in range(10):
        e = jnp.zeros(10).at[k].set(eps)
        fd = (f(e) - f(-e)) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-5)


def test_vp_residual_zero_when_direction_matches(rng):
    p_i, q_i, p_ic, q_ic, orth, obs, v_w = make_line_setup(rng)
    # observed VP = direction of the line in camera frame (homogeneous)
    q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_i, p_i, q_ic, p_ic))
    d_c = geo.quat_rotate(q_cw, v_w)
    r = res.vp_alignment(p_i, q_i, p_ic, q_ic, orth, d_c)
    np.testing.assert_allclose(r, np.zeros(2), atol=1e-9)


def test_vp_residual_nonzero_for_wrong_vp(rng):
    p_i, q_i, p_ic, q_ic, orth, obs, v_w = make_line_setup(rng)
    bad_vp = jnp.asarray([0.3, -0.4, 1.0])
    r = res.vp_alignment(p_i, q_i, p_ic, q_ic, orth, bad_vp)
    assert float(jnp.linalg.norm(r)) > 1e-3


def test_robust_weights():
    # Huber: unit weight inside delta, shrinks outside
    assert float(res.huber_weight(jnp.asarray(0.5), 1.0)) == 1.0
    w = float(res.huber_weight(jnp.asarray(100.0), 1.0))
    assert 0 < w < 1
    # Cauchy monotone decreasing
    w1 = float(res.cauchy_weight(jnp.asarray(0.1), 1.0))
    w2 = float(res.cauchy_weight(jnp.asarray(10.0), 1.0))
    assert w1 > w2


def test_vmap_over_population(rng):
    """Factors batch over a fixed-shape population (the BA layout)."""
    setups = [make_point_setup(rng) for _ in range(8)]
    stacked = [jnp.stack([jnp.asarray(s[k]) for s in setups]) for k in range(9)]
    r = jax.vmap(res.point_reprojection)(*stacked)
    assert r.shape == (8, 2)
    np.testing.assert_allclose(r, np.zeros((8, 2)), atol=1e-10)
