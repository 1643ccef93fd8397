import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import plucker as plk


def rand_quat(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return jnp.asarray(q)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_rotate_matches_matrix(rng):
    for _ in range(10):
        q = rand_quat(rng)
        v = jnp.asarray(rng.standard_normal(3))
        R = geo.quat_to_rot(q)
        np.testing.assert_allclose(geo.quat_rotate(q, v), R @ v, atol=1e-12)


def test_quat_mul_matches_rotation_composition(rng):
    q1, q2 = rand_quat(rng), rand_quat(rng)
    R = geo.quat_to_rot(geo.quat_mul(q1, q2))
    np.testing.assert_allclose(R, geo.quat_to_rot(q1) @ geo.quat_to_rot(q2), atol=1e-12)


def test_rot_quat_roundtrip(rng):
    for _ in range(20):
        q = rand_quat(rng)
        q2 = geo.rot_to_quat(geo.quat_to_rot(q))
        np.testing.assert_allclose(q2, q, atol=1e-9)


def test_exp_log_roundtrip(rng):
    for scale in [1e-8, 1e-3, 0.5, 1.0]:
        th = jnp.asarray(rng.standard_normal(3)) * scale
        q = geo.so3_exp_quat(th)
        assert abs(float(jnp.linalg.norm(q)) - 1) < 1e-12
        np.testing.assert_allclose(geo.quat_log(q), th, atol=1e-9)
    # beyond pi the log returns the principal rotation vector: exp must agree
    th = jnp.asarray(rng.standard_normal(3)) * 3.0
    q = geo.so3_exp_quat(th)
    q2 = geo.so3_exp_quat(geo.quat_log(q))
    assert min(float(jnp.linalg.norm(q2 - q)), float(jnp.linalg.norm(q2 + q))) < 1e-9


def test_qleft_qright(rng):
    q, p = rand_quat(rng), rand_quat(rng)
    np.testing.assert_allclose(geo.quat_left(q) @ p, geo.quat_mul(q, p), atol=1e-12)
    np.testing.assert_allclose(geo.quat_right(p) @ q, geo.quat_mul(q, p), atol=1e-12)


def test_ypr_roundtrip(rng):
    ypr = jnp.asarray([30.0, -20.0, 55.0])
    np.testing.assert_allclose(geo.rot_to_ypr(geo.ypr_to_rot(ypr)), ypr, atol=1e-9)


def test_gravity_to_rot():
    g = jnp.asarray([0.3, -0.2, 9.7])
    R0 = geo.gravity_to_rot(g)
    aligned = R0 @ (g / jnp.linalg.norm(g))
    np.testing.assert_allclose(aligned, [0.0, 0.0, 1.0], atol=1e-12)
    # zero yaw
    assert abs(float(geo.rot_to_ypr(R0)[0])) < 1e-9


def test_pose_compose_inverse(rng):
    q, p = rand_quat(rng), jnp.asarray(rng.standard_normal(3))
    qi, pi = geo.pose_inverse(q, p)
    qc, pc = geo.pose_compose(q, p, qi, pi)
    np.testing.assert_allclose(pc, np.zeros(3), atol=1e-12)
    np.testing.assert_allclose(abs(float(qc[0])), 1.0, atol=1e-12)


def test_dtype_preservation(rng):
    q32 = rand_quat(rng).astype(jnp.float32)
    assert geo.quat_to_rot(q32).dtype == jnp.float32
    assert geo.so3_exp_quat(jnp.ones(3, jnp.float32)).dtype == jnp.float32


# ---------------------------------------------------------------------------
# Plücker lines
# ---------------------------------------------------------------------------


def random_plucker(rng):
    p = rng.standard_normal(3) * 2.0
    v = rng.standard_normal(3)
    v /= np.linalg.norm(v)
    n = np.cross(p, v)
    return jnp.asarray(np.concatenate([n, v]))


def test_orth_plk_roundtrip(rng):
    for _ in range(20):
        L = random_plucker(rng)
        orth = plk.plk_to_orth(L)
        L2 = plk.orth_to_plk(orth)
        # roundtrip is up to overall scale: compare normalized
        np.testing.assert_allclose(
            np.asarray(L2) / np.linalg.norm(L2),
            np.asarray(L) / np.linalg.norm(L),
            atol=1e-9,
        )


def test_two_plane_intersection(rng):
    # line through points a,b observed from two camera centers c1, c2
    a = jnp.asarray([1.0, 0.5, 3.0])
    b = jnp.asarray([1.5, -0.5, 4.0])
    c1 = jnp.asarray([0.0, 0.0, 0.0])
    c2 = jnp.asarray([0.5, 0.1, 0.0])
    pi1 = plk.pi_from_ppp(a, b, c1)
    pi2 = plk.pi_from_ppp(a, b, c2)
    L = plk.pipi_plk(pi1, pi2)
    n, v = L[:3], L[3:]
    # direction parallel to b-a
    d = (b - a) / jnp.linalg.norm(b - a)
    vv = v / jnp.linalg.norm(v)
    assert min(float(jnp.linalg.norm(vv - d)), float(jnp.linalg.norm(vv + d))) < 1e-9
    # moment consistent: n ∝ a × v
    na = jnp.cross(a, v)
    np.testing.assert_allclose(
        np.asarray(n) / np.linalg.norm(n), np.asarray(na) / np.linalg.norm(na), atol=1e-9
    )


def test_plk_transform_roundtrip(rng):
    L = random_plucker(rng)
    q = rand_quat(rng)
    R = geo.quat_to_rot(q)
    t = jnp.asarray(rng.standard_normal(3))
    Lc = plk.plk_transform(L, R, t)
    Lw = plk.plk_transform_inv(Lc, R, t)
    np.testing.assert_allclose(Lw, L, atol=1e-9)


def test_plk_transform_moves_points(rng):
    # a point on the world line maps to a point on the camera line
    L = random_plucker(rng)
    q = rand_quat(rng)
    R = geo.quat_to_rot(q)
    t = jnp.asarray(rng.standard_normal(3))
    Lc = plk.plk_transform(L, R, t)
    p_w = plk.plucker_origin(L[:3], L[3:])
    p_c = R @ p_w + t
    # p_c must lie on Lc: n_c == p_c × v_c up to the same scale
    np.testing.assert_allclose(jnp.cross(p_c, Lc[3:]), Lc[:3], atol=1e-9)


def test_orth_boxplus_zero(rng):
    L = random_plucker(rng)
    orth = plk.plk_to_orth(L)
    np.testing.assert_allclose(plk.orth_boxplus(orth, jnp.zeros(4)), orth, atol=1e-9)


def test_orth_boxplus_first_order(rng):
    L = random_plucker(rng)
    orth = plk.plk_to_orth(L)
    delta = jnp.asarray([1e-4, -2e-4, 1.5e-4, -1e-4])
    o2 = plk.orth_boxplus(orth, delta)
    # φ update is exact
    np.testing.assert_allclose(o2[3], orth[3] + delta[3], atol=1e-12)
    # the plucker line moves smoothly
    L2 = plk.orth_to_plk(o2)
    assert float(jnp.linalg.norm(L2 - plk.orth_to_plk(orth))) < 1e-2
