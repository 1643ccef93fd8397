import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import calibration as cal
from vplines_slam_tpu.models import selector as sel
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn


def test_extrinsic_rotation_hand_eye():
    rng = np.random.default_rng(1)
    q_ic_true = geo.so3_exp_quat(jnp.asarray([0.1, -0.2, 1.5]))
    K = 30
    q_cam, q_imu, valid = [], [], []
    for _ in range(K):
        w = rng.standard_normal(3) * 0.2
        qi = geo.so3_exp_quat(jnp.asarray(w))  # body relative rotation
        # camera relative rotation: q_c = q_ic^-1 q_i q_ic
        qc = geo.quat_mul(geo.quat_conj(q_ic_true), geo.quat_mul(qi, q_ic_true))
        q_cam.append(qc)
        q_imu.append(qi)
        valid.append(True)
    q_est, conv, s2 = cal.calibrate_extrinsic_rotation(
        jnp.stack(q_cam), jnp.stack(q_imu), jnp.asarray(valid)
    )
    assert bool(conv)
    qd = geo.quat_mul(geo.quat_conj(q_est), q_ic_true)
    assert abs(float(qd[0])) > 1 - 1e-8


def test_time_offset_calibration():
    """Camera yaw curve delayed by a known td must be recovered."""
    td_true = 0.035
    t_imu = jnp.linspace(0.0, 7.0, 700)
    yaw = 0.5 * jnp.sin(1.3 * t_imu) + 0.2 * t_imu
    t_cam = jnp.linspace(0.3, 6.5, 40)
    # camera observes the yaw value at (t_cam + td_true)
    yaw_cam = 0.5 * jnp.sin(1.3 * (t_cam + td_true)) + 0.2 * (t_cam + td_true)
    td, rms = cal.calibrate_time_offset(
        t_cam, yaw_cam, jnp.ones(40, bool), t_imu, yaw
    )
    assert abs(float(td) - td_true) < 0.004, float(td)
    assert float(rms) < 1e-3


def test_integrate_gyro_yaw():
    traj = syn.figure8_trajectory()
    ts = jnp.linspace(0.0, 2.0, 400)
    _, gyrs = syn.imu_samples(traj, ts)
    yaws = cal.integrate_gyro_yaw(ts, gyrs, q0=traj.quat(0.0))
    yaw_true = jnp.deg2rad(
        jax.vmap(lambda t: geo.rot_to_ypr(geo.quat_to_rot(traj.quat(t)))[0])(ts)
    )
    np.testing.assert_allclose(yaws, yaw_true, atol=2e-3)


# ---------------------------------------------------------------------------
# feature selector
# ---------------------------------------------------------------------------


def test_selector_prefers_informative_features():
    """Features visible over the horizon and well-conditioned must be chosen
    over features that leave the FOV."""
    h = sel.HORIZON
    # horizon: moving forward (+x body = +z cam with identity extrinsic here)
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    ps = jnp.stack([jnp.array([0.0, 0.0, 0.1 * k]) for k in range(h + 1)])
    qs = jnp.stack([ident] * (h + 1))
    q_ic, p_ic = ident, jnp.zeros(3)

    # candidates: first 5 dead ahead (visible all horizon), last 5 at extreme
    # angles (leave FOV immediately)
    rays = []
    for k in range(5):
        rays.append([0.05 * k - 0.1, 0.02 * k - 0.04, 1.0])
    for k in range(5):
        rays.append([3.5 + k, 2.0, 1.0])  # far outside img_fov
    rays = jnp.asarray(rays)
    rays = rays / rays[:, 2:3]
    depths = jnp.full(10, 4.0)
    valid = jnp.ones(10, bool)

    omega_f = sel.feature_information(
        rays, depths, valid, ps, qs, q_ic, p_ic, pix_sigma=1.0 / 460.0
    )
    omega_0 = sel.imu_prior_information(dt=0.1, acc_var=0.04)
    cfg = sel.SelectorConfig()
    chosen, gains = sel.select_features(omega_0, omega_f, valid, budget=4, cfg=cfg)
    assert int(jnp.sum(chosen)) == 4
    assert bool(jnp.all(chosen[:5][jnp.asarray(np.flatnonzero(np.asarray(chosen[:5])))]))
    assert not bool(jnp.any(chosen[5:])), "out-of-FOV features selected"
    # gains of visible features strictly positive
    assert float(jnp.min(gains[:5])) > 0


def test_selector_horizon_propagation():
    traj = syn.figure8_trajectory()
    t0 = 1.0
    p0, q0 = traj.pos(t0), traj.quat(t0)
    v0 = syn.world_velocity(traj, t0)
    accs, gyrs = syn.imu_samples(traj, jnp.asarray([t0]))
    g = jnp.array([0.0, 0.0, syn.GRAVITY])
    ps, qs, vs = sel.propagate_horizon(
        p0, q0, v0, jnp.zeros(3), jnp.zeros(3), accs[0], gyrs[0], 0.1, g
    )
    assert ps.shape == (sel.HORIZON + 1, 3)
    # rough agreement with the true future (constant-IMU approximation)
    p_true = traj.pos(t0 + 0.4)
    assert float(jnp.linalg.norm(ps[-1] - p_true)) < 0.1
