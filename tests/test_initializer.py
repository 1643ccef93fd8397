import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.estimator import initializer as init_mod
from vplines_slam_tpu.models import imu as imu_mod
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn


F = 11  # window+1 frames
FRAME_DT = 0.35
IMU_HZ = 200
N_PTS = 60

Q_IC = geo.so3_exp_quat(jnp.asarray([0.0, 0.0, 0.0]))  # aligned extrinsic
P_IC = jnp.asarray([0.05, 0.02, 0.03])


def build_window(gyr_bias=None, pix_noise=0.0, seed=0):
    traj = syn.figure8_trajectory()
    frame_times = jnp.asarray([1.0 + FRAME_DT * k for k in range(F)])
    X = syn.scatter_landmarks(N_PTS, seed=seed)

    obs = []
    masks = []
    for k in range(F):
        q_wb = traj.quat(frame_times[k])
        p_wb = traj.pos(frame_times[k])
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
        uv = Xc[:, :2] / Xc[:, 2:3]
        if pix_noise:
            rng = np.random.default_rng(seed + k)
            uv = uv + jnp.asarray(rng.standard_normal(uv.shape)) * pix_noise
        obs.append(uv)
        masks.append(Xc[:, 2] > 0.3)
    obs = jnp.stack(obs, axis=1)  # [N, F, 2]
    mask = jnp.stack(masks, axis=1)

    # preintegrations per interval at bg=0
    n_sub = int(FRAME_DT * IMU_HZ)
    pres = []
    for k in range(F - 1):
        ts = jnp.linspace(frame_times[k], frame_times[k + 1], n_sub + 1)
        accs, gyrs = syn.imu_samples(traj, ts, gyr_bias=gyr_bias)
        dts = jnp.diff(ts)
        pres.append(
            imu_mod.preintegrate(
                dts, accs, gyrs, jnp.ones_like(dts), jnp.zeros(3), jnp.zeros(3),
                imu_mod.default_params(),
            )
        )
    pre = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    valid = jnp.ones(F - 1, bool)
    return traj, frame_times, obs, mask, pre, valid


def test_choose_reference_frame():
    traj, times, obs, mask, pre, valid = build_window()
    l, found = init_mod.choose_reference_frame(obs, mask)
    assert bool(found)
    assert 0 <= int(l) < F - 1


@pytest.mark.slow
def test_window_sfm_recovers_relative_geometry():
    traj, times, obs, mask, pre, valid = build_window()
    l, found = init_mod.choose_reference_frame(obs, mask)
    sfm, invd, pt_ok = init_mod.window_sfm(obs, mask, int(l), jax.random.PRNGKey(0))
    assert bool(sfm.ok)
    # camera-frame relative rotations must match ground truth (cam == body+Q_IC)
    for k in [0, 5, F - 1]:
        q_wb = traj.quat(times[k])
        q_wc = geo.quat_mul(q_wb, Q_IC)
        q_wl = geo.quat_mul(traj.quat(times[int(l)]), Q_IC)
        R_lc_true = geo.quat_to_rot(geo.quat_mul(geo.quat_conj(q_wl), q_wc))
        np.testing.assert_allclose(sfm.R_c0_c[k], R_lc_true, atol=2e-4)
    # positions up to scale: compare normalized baselines
    p_c = []
    for k in range(F):
        q_wb, p_wb = traj.quat(times[k]), traj.pos(times[k])
        _, p_wc = geo.pose_compose(q_wb, p_wb, Q_IC, P_IC)
        p_c.append(p_wc)
    p_c = jnp.stack(p_c)
    q_wl = geo.quat_mul(traj.quat(times[int(l)]), Q_IC)
    p_rel_true = jax.vmap(
        lambda p: geo.quat_rotate(geo.quat_conj(q_wl), p - p_c[int(l)])
    )(p_c)
    s = jnp.linalg.norm(p_rel_true[-1]) / jnp.linalg.norm(sfm.t_c0_c[-1])
    np.testing.assert_allclose(sfm.t_c0_c * s, p_rel_true, atol=5e-3)


@pytest.mark.slow
def test_full_alignment_recovers_metric_state():
    bg_true = jnp.asarray([0.003, -0.002, 0.004])
    traj, times, obs, mask, pre, valid = build_window(gyr_bias=bg_true)
    l, found = init_mod.choose_reference_frame(obs, mask)
    sfm, invd, pt_ok = init_mod.window_sfm(obs, mask, int(l), jax.random.PRNGKey(0))
    out = init_mod.visual_inertial_align(sfm, pre, valid, Q_IC, P_IC, syn.GRAVITY)
    assert bool(out.ok)
    # gyro bias recovered
    np.testing.assert_allclose(out.bg, bg_true, atol=5e-4)
    # metric scale: inter-frame distances match ground truth
    p_true = jnp.stack([traj.pos(t) for t in times])
    d_true = jnp.linalg.norm(p_true[1:] - p_true[:-1], axis=-1)
    d_est = jnp.linalg.norm(out.p[1:] - out.p[:-1], axis=-1)
    np.testing.assert_allclose(d_est, d_true, rtol=0.03)
    # gravity aligned to +z with correct magnitude
    np.testing.assert_allclose(
        out.g_world, [0.0, 0.0, syn.GRAVITY], atol=0.05
    )
    # velocity magnitudes match
    v_true = jnp.stack([syn.world_velocity(traj, t) for t in times])
    np.testing.assert_allclose(
        jnp.linalg.norm(out.v, axis=-1), jnp.linalg.norm(v_true, axis=-1), rtol=0.05, atol=0.02
    )
    # relative orientations preserved (world frame differs only by yaw)
    q_rel_est = geo.quat_mul(geo.quat_conj(out.q[0]), out.q[-1])
    q_rel_true = geo.quat_mul(geo.quat_conj(traj.quat(times[0])), traj.quat(times[-1]))
    qd = geo.quat_mul(geo.quat_conj(q_rel_est), q_rel_true)
    assert abs(float(qd[0])) > 1 - 1e-4


def test_gyro_bias_solver_isolated():
    bg_true = jnp.asarray([0.01, -0.005, 0.008])
    traj, times, obs, mask, pre, valid = build_window(gyr_bias=bg_true)
    # visual relative rotations = ground truth body rotations
    q_rel = []
    for k in range(F - 1):
        q_rel.append(
            geo.quat_mul(geo.quat_conj(traj.quat(times[k])), traj.quat(times[k + 1]))
        )
    dbg = init_mod.solve_gyro_bias(jnp.stack(q_rel), pre, valid)
    np.testing.assert_allclose(dbg, bg_true, atol=2e-4)
