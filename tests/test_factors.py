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


def test_line_incamera_zero_at_truth_and_fd(rng):
    q_i, p_i = random_pose(rng)
    q_j, p_j = random_pose(rng)
    q_ic = geo.so3_exp_quat(jnp.asarray([0.01, -0.02, 1.55]))
    p_ic = jnp.asarray([0.05, 0.02, 0.0])
    A_w = jnp.asarray([1.0, -0.8, 6.0])
    B_w = jnp.asarray([0.4, 0.9, 5.2])

    def to_cam(q_b, p_b, X):
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_b, p_b, q_ic, p_ic))
        return geo.transform_point(q_cw, p_cw, X)

    a_i = to_cam(q_i, p_i, A_w)
    b_i = to_cam(q_i, p_i, B_w)
    # camera-i-frame Plücker line through the two points
    plk_ci = jnp.concatenate([jnp.cross(a_i, b_i), b_i - a_i])
    orth_ci = plk.plk_to_orth(plk_ci)

    a_j = to_cam(q_j, p_j, A_w)
    b_j = to_cam(q_j, p_j, B_w)
    obs_j = jnp.asarray([a_j[0] / a_j[2], a_j[1] / a_j[2], b_j[0] / b_j[2], b_j[1] / b_j[2]])

    r = res.line_reprojection_incamera(p_i, q_i, p_j, q_j, p_ic, q_ic, orth_ci, obs_j)
    np.testing.assert_allclose(np.asarray(r), np.zeros(2), atol=1e-9)

    # jacobian wrt (pose_i manifold, pose_j manifold, line orth) vs central FD
    def f(delta):
        qi2 = geo.quat_mul(q_i, geo.so3_exp_quat(delta[0:3]))
        pi2 = p_i + delta[3:6]
        qj2 = geo.quat_mul(q_j, geo.so3_exp_quat(delta[6:9]))
        pj2 = p_j + delta[9:12]
        o2 = plk.orth_boxplus(orth_ci, delta[12:16])
        return res.line_reprojection_incamera(pi2, qi2, pj2, qj2, p_ic, q_ic, o2, obs_j)

    J = jax.jacfwd(f)(jnp.zeros(16))
    eps = 1e-6
    for k in range(16):
        e = jnp.zeros(16).at[k].set(eps)
        fd = (f(e) - f(-e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, k]), np.asarray(fd), atol=1e-5)


def test_line_instartframe_zero_at_truth_and_fd(rng):
    a_i = jnp.asarray([0.3, -0.2, 4.0])
    b_i = jnp.asarray([-0.5, 0.4, 5.0])
    plk_ci = jnp.concatenate([jnp.cross(a_i, b_i), b_i - a_i])
    orth_ci = plk.plk_to_orth(plk_ci)
    obs_i = jnp.asarray([a_i[0] / a_i[2], a_i[1] / a_i[2], b_i[0] / b_i[2], b_i[1] / b_i[2]])
    r = res.line_reprojection_instartframe(orth_ci, obs_i)
    np.testing.assert_allclose(np.asarray(r), np.zeros(2), atol=1e-10)

    def f(d):
        return res.line_reprojection_instartframe(plk.orth_boxplus(orth_ci, d), obs_i)

    J = jax.jacfwd(f)(jnp.zeros(4))
    eps = 1e-6
    for k in range(4):
        e = jnp.zeros(4).at[k].set(eps)
        fd = (f(e) - f(-e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, k]), np.asarray(fd), atol=1e-5)
