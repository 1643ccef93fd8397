import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import camera as cam_mod


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def euroc_cam():
    # EuRoC cam0 intrinsics (config/euroc/euroc_config.yaml)
    return cam_mod.pinhole(
        fx=461.6, fy=460.3, cx=363.0, cy=248.1,
        k1=-2.917e-01, k2=8.228e-02, p1=5.333e-05, p2=-1.578e-04,
    )


def random_points(rng, n=200):
    X = rng.standard_normal((n, 3))
    X[:, 2] = np.abs(X[:, 2]) + 1.0
    X[:, 0] *= 0.4
    X[:, 1] *= 0.3
    return jnp.asarray(X)


def test_pinhole_project_lift_roundtrip(rng):
    cam = euroc_cam()
    X = random_points(rng)
    uv, valid = cam_mod.project(cam, X)
    assert bool(jnp.all(valid))
    xyz = cam_mod.lift(cam, uv)
    ref = X / X[:, 2:3]
    np.testing.assert_allclose(xyz, ref, atol=1e-8)


def test_pinhole_no_distortion_is_linear(rng):
    cam = cam_mod.pinhole(400.0, 400.0, 376.0, 240.0)
    X = jnp.asarray([[0.1, -0.2, 2.0]])
    uv, _ = cam_mod.project(cam, X)
    np.testing.assert_allclose(uv[0], [400 * 0.05 + 376, 400 * -0.1 + 240], atol=1e-12)


def test_equidistant_roundtrip(rng):
    # TUM-VI style fisheye (config/tum/tum_config.yaml KANNALA_BRANDT)
    cam = cam_mod.equidistant(
        fx=190.97, fy=190.97, cx=254.93, cy=256.89,
        k2=0.00348, k3=0.000715, k4=-0.00205, k5=0.000202,
        width=512, height=512,
    )
    X = random_points(rng)
    uv, valid = cam_mod.project(cam, X)
    xyz = cam_mod.lift(cam, uv)
    ref = X / X[:, 2:3]
    np.testing.assert_allclose(xyz, ref, atol=1e-6)


def test_mei_roundtrip(rng):
    # t265-style MEI camera (config/t265/t265.yaml)
    cam = cam_mod.mei(
        gamma1=285.0, gamma2=286.0, u0=420.0, v0=400.0,
        xi=0.65, k1=-0.0057, k2=0.021, p1=-0.0002, p2=0.0002,
        width=848, height=800,
    )
    X = random_points(rng)
    uv, valid = cam_mod.project(cam, X)
    xyz = cam_mod.lift(cam, uv)
    ref = X / X[:, 2:3]
    np.testing.assert_allclose(xyz, ref, atol=1e-5)


def test_lift_to_sphere_unit_norm(rng):
    cam = euroc_cam()
    uv = jnp.asarray(rng.uniform(100, 600, size=(50, 2)))
    rays = cam_mod.lift_to_sphere(cam, uv)
    np.testing.assert_allclose(jnp.linalg.norm(rays, axis=-1), 1.0, atol=1e-12)


def test_undistort_map_shape_and_center():
    cam = euroc_cam()
    m = cam_mod.undistort_rectify_map(cam)
    assert m.shape == (480, 752, 2)
    # principal point maps (nearly) to itself: zero distortion at center
    cy, cx = int(cam.cy), int(cam.cx)
    assert abs(float(m[cy, cx, 0]) - cx) < 2.0
    assert abs(float(m[cy, cx, 1]) - cy) < 2.0


def test_project_jits_and_batches(rng):
    cam = euroc_cam()
    X = random_points(rng, 1024)
    f = jax.jit(lambda X: cam_mod.project(cam, X)[0])
    uv = f(X)
    assert uv.shape == (1024, 2)


def test_scaramuzza_roundtrip(rng):
    # typical omnidirectional polynomial (f(rho) decreasing from a0<0 style
    # camodocal: a0 negative means z flips; use a fisheye-like positive set)
    cam = cam_mod.scaramuzza(
        a0=250.0, a2=-0.0012, a3=1.2e-6, a4=-5e-10, cx=400.0, cy=300.0,
        width=800, height=600,
    )
    # forward-looking polynomial (a0>0 convention; flip sign if calibrated a0<0)
    uv = jnp.asarray(rng.uniform([150, 120], [650, 480], size=(40, 2)))
    rays = cam_mod.lift(cam, uv)
    # reproject the lifted ray: must land on the original pixel
    uv2, ok = cam_mod.project(cam, rays)
    np.testing.assert_allclose(uv2, uv, atol=2e-4)
