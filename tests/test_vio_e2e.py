"""End-to-end monocular VIO on a synthetic sequence (BASELINE.json config 1).

Simulated pin-sharp front-end: ground-truth landmark projections with ids,
IMU at 200 Hz with noise+bias.  The engine must initialize, track the full
sequence and land within a tight ATE bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.estimator.vio import VioEngine
from vplines_slam_tpu.estimator.window import WindowConfig
from vplines_slam_tpu.models import imu as imu_mod
from vplines_slam_tpu.utils import evaluation as ev
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn

# forward-looking camera: cam z -> body x, cam x -> -body y, cam y -> -body z
R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
Q_IC = geo.rot_to_quat(R_BC)
P_IC = jnp.asarray([0.05, 0.02, 0.03])

CFG = WindowConfig(max_points=96, max_lines=8, max_imu=32, min_parallax=10.0 / 460.0)


def run_sequence(
    duration=8.0, frame_hz=10, imu_hz=200, n_landmarks=400, pix_noise=0.0,
    imu_noise=False, seed=0,
):
    traj = syn.figure8_trajectory()
    X = syn.scatter_landmarks(n_landmarks, seed=seed)
    params = imu_mod.default_params()

    eng = VioEngine(CFG, params, q_ic=Q_IC, p_ic=P_IC)

    rng = np.random.default_rng(seed + 1)
    bg_true = np.array([0.002, -0.003, 0.001])

    frame_times = np.arange(0.0, duration, 1.0 / frame_hz)
    imu_times = np.arange(0.0, duration + 1e-9, 1.0 / imu_hz)
    accs, gyrs = syn.imu_samples(
        traj, jnp.asarray(imu_times),
        acc_noise=0.02 if imu_noise else 0.0,
        gyr_noise=0.002 if imu_noise else 0.0,
        gyr_bias=bg_true if imu_noise else None,
        seed=seed,
    )
    accs = np.asarray(accs)
    gyrs = np.asarray(gyrs)

    est_t, est_p, est_q = [], [], []
    imu_idx = 0
    for ft in frame_times:
        while imu_idx < len(imu_times) and imu_times[imu_idx] <= ft + 1e-9:
            eng.add_imu(imu_times[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        # project landmarks
        q_wb = traj.quat(ft)
        p_wb = traj.pos(ft)
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
        uv = np.asarray(Xc[:, :2] / Xc[:, 2:3])
        vis = np.asarray(
            (Xc[:, 2] > 0.3)
            & (np.abs(uv[:, 0]) < 0.82)  # ~±0.8 rad FOV half-angle
            & (np.abs(uv[:, 1]) < 0.55)
        )
        if pix_noise:
            uv = uv + rng.standard_normal(uv.shape) * pix_noise
        ids = np.where(vis, np.arange(len(X)), -1)
        # cap observations per frame like the reference front-end (max_cnt)
        sel = np.flatnonzero(vis)[: CFG.max_points - 8]
        M = CFG.max_points
        pt_ids = np.full(M, -1, np.int32)
        pt_rays = np.zeros((M, 3))
        pt_rays[:, 2] = 1.0
        pt_ids[: len(sel)] = sel
        pt_rays[: len(sel), 0:2] = uv[sel]
        out = eng.add_frame(ft, pt_ids, pt_rays)
        if out is not None and eng.initialized:
            est_t.append(ft)
            est_p.append(np.asarray(out.p))
            est_q.append(np.asarray(out.q))

    gt_p = np.stack([np.asarray(traj.pos(t)) for t in est_t])
    return np.asarray(est_t), np.stack(est_p), gt_p, eng


@pytest.mark.slow
def test_vio_clean_sequence_ate():
    t, p_est, p_gt, eng = run_sequence(duration=6.0)
    assert eng.initialized
    assert len(t) >= 40
    ate = ev.ate_rmse(p_est, p_gt, align=True)
    assert ate < 0.05, f"ATE {ate:.4f} m too large"


@pytest.mark.slow
def test_vio_noisy_sequence_ate():
    t, p_est, p_gt, eng = run_sequence(
        duration=6.0, pix_noise=0.5 / 460.0, imu_noise=True
    )
    assert eng.initialized
    ate = ev.ate_rmse(p_est, p_gt, align=True)
    # VINS-class systems run 0.07-0.18 m on EuRoC; the short 1.1 s init
    # window under noise+bias dominates this bound (scale converges slowly)
    assert ate < 0.20, f"ATE {ate:.4f} m too large"


def test_ate_utils():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 3))
    R = np.asarray(geo.so3_exp_matrix(jnp.asarray([0.3, 0.1, -0.2])))
    y = (R @ x.T).T + np.array([1.0, 2.0, 3.0])
    assert ev.ate_rmse(x, y, align=True) < 1e-10
    assert ev.ate_rmse(x, y, align=False) > 1.0
    R_, t_, c_ = ev.umeyama_alignment(x, 2.0 * (R @ x.T).T, with_scale=True)
    assert abs(c_ - 2.0) < 1e-9
