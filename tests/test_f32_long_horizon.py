"""f32 long-horizon conditioning: the TPU production dtype over 60+ s.

Repeated marginalization in float32 is where a square-root prior can bleed
rank (solver/marginalization.py keeps the prior in √form exactly so this
does not happen) — but until r03 nothing ran the f32 path past ~16 s of
motion.  This drives the engine at dtype=float32 through a 64 s figure-8
(640 frames, ~630 marginalizations) with IMU noise + gyro bias and asserts

  * the estimate never diverges (bounded ATE after alignment),
  * velocity stays physical and the gyro-bias estimate converges to the
    injected bias instead of drifting,
  * the prior √-factor stays finite with a bounded spectral radius — the
    conditioning failure mode (rank bleed -> exploding J) is what this
    catches, 40x longer horizon than any other f32 run in the suite.

Reference comparison: the reference runs double-precision ceres on CPU; the
TPU-native design must justify f32 explicitly (BASELINE.md / docs/PERF.md).
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

R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]],
                   jnp.float32)
Q_IC = geo.rot_to_quat(R_BC)
P_IC = jnp.asarray([0.05, 0.02, 0.03], jnp.float32)

CFG = WindowConfig(max_points=96, max_lines=8, max_imu=32,
                   min_parallax=10.0 / 460.0)


@pytest.mark.slow
def test_f32_long_horizon_stability():
    dtype = jnp.float32
    duration, frame_hz, imu_hz = 64.0, 10, 200
    bg_true = np.array([0.002, -0.003, 0.001])

    traj = syn.figure8_trajectory()
    X = np.asarray(syn.scatter_landmarks(400, seed=0))
    params = imu_mod.default_params(dtype)
    eng = VioEngine(CFG, params, q_ic=Q_IC, p_ic=P_IC, dtype=dtype)
    rng = np.random.default_rng(1)

    frame_times = np.arange(0.0, duration, 1.0 / frame_hz)
    imu_times = np.arange(0.0, duration + 1e-9, 1.0 / imu_hz)
    accs, gyrs = syn.imu_samples(
        traj, jnp.asarray(imu_times), acc_noise=0.02, gyr_noise=0.002,
        gyr_bias=bg_true, seed=0,
    )
    accs, gyrs = np.asarray(accs, np.float32), np.asarray(gyrs, np.float32)

    est_t, est_p = [], []
    n_marg = 0
    imu_idx = 0
    for ft in frame_times:
        while imu_idx < len(imu_times) and imu_times[imu_idx] <= ft + 1e-9:
            eng.add_imu(imu_times[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        q_wb, p_wb = traj.quat(ft), traj.pos(ft)
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))
        Xc = np.asarray(
            jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, jnp.asarray(x)))(X)
        )
        uv = Xc[:, :2] / Xc[:, 2:3]
        vis = (Xc[:, 2] > 0.3) & (np.abs(uv[:, 0]) < 0.82) & (np.abs(uv[:, 1]) < 0.55)
        uv = uv + rng.standard_normal(uv.shape) * 0.25 / 460.0  # 0.25 px
        sel = np.flatnonzero(vis)[: CFG.max_points - 8]
        M = CFG.max_points
        pt_ids = np.full(M, -1, np.int32)
        pt_rays = np.zeros((M, 3), np.float32)
        pt_rays[:, 2] = 1.0
        pt_ids[: len(sel)] = sel
        pt_rays[: len(sel), 0:2] = uv[sel]
        out = eng.add_frame(ft, pt_ids, pt_rays)
        if out is not None and eng.initialized:
            est_t.append(ft)
            est_p.append(np.asarray(out.p))
            n_marg += 1

    assert eng.initialized, "f32 engine failed to initialize"
    assert n_marg > 550, f"only {n_marg} steady frames"

    # 1) bounded global error over the full minute (monocular VIO with
    # noise+bias; alignment removes the unobservable gauge)
    gt_p = np.stack([np.asarray(traj.pos(t)) for t in est_t])
    ate = ev.ate_rmse(np.stack(est_p), gt_p, align=True)
    assert np.isfinite(ate) and ate < 0.6, f"f32 long-horizon ATE {ate:.3f} m"

    # 2) late-window physicality: velocity magnitude and bias convergence
    state = eng.state
    v = np.asarray(state.v)
    assert np.all(np.isfinite(v)) and np.max(np.linalg.norm(v, axis=1)) < 5.0
    bg_err = np.linalg.norm(np.asarray(state.bg[-2]) - bg_true)
    assert bg_err < 0.01, f"gyro bias off by {bg_err:.4f} rad/s after 64 s"
    ba_mag = np.linalg.norm(np.asarray(state.ba[-2]))
    assert ba_mag < 0.5, f"accel bias drifted to {ba_mag:.3f} m/s^2"

    # 3) prior health after ~600 f32 marginalizations: finite √-factor,
    # bounded spectral radius (rank bleed shows up as runaway rows)
    prior = eng.data.prior
    J = np.asarray(prior.J, np.float64)
    assert bool(np.asarray(prior.valid))
    assert np.all(np.isfinite(J)) and np.all(np.isfinite(np.asarray(prior.r0)))
    sv = np.linalg.svd(J, compute_uv=False)
    assert sv[0] < 1e6, f"prior spectral radius exploded: {sv[0]:.3e}"
    # the prior must still constrain the window (not have decayed to zero)
    assert sv[0] > 1.0, f"prior vanished: {sv[0]:.3e}"
