"""The three round-1 orphans wired into the product (VERDICT items 1-3):

1. extrinsic mode 2: VIO initializes from UNKNOWN camera-IMU rotation via
   the in-loop hand-eye calibration (estimator.cpp:141-173 parity);
2. online time-offset calibration: a deliberately time-shifted IMU stream
   recovers the injected td within 2 ms and shifts measurement alignment;
3. attention feature selector: SlamSystem._jit_select keeps tracked
   features, respects the information budget, and preserves e2e accuracy.
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

R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
Q_IC = geo.rot_to_quat(R_BC)
P_IC = jnp.asarray([0.05, 0.02, 0.03])

CFG = WindowConfig(max_points=96, max_lines=8, max_imu=32)


def drive(eng, duration=6.0, frame_hz=10, imu_hz=200, n_landmarks=400,
          imu_stamp_shift=0.0, seed=0, select_fn=None):
    """Feed a synthetic sequence.  imu_stamp_shift: IMU samples carrying the
    motion of true time tau are STAMPED tau + shift (clock offset between the
    two sensors)."""
    traj = syn.figure8_trajectory()
    X = syn.scatter_landmarks(n_landmarks, seed=seed)
    frame_times = np.arange(0.0, duration, 1.0 / frame_hz)
    imu_true_times = np.arange(
        -imu_stamp_shift if imu_stamp_shift < 0 else 0.0,
        duration + 1e-9, 1.0 / imu_hz,
    )
    accs, gyrs = syn.imu_samples(traj, jnp.asarray(imu_true_times))
    accs, gyrs = np.asarray(accs), np.asarray(gyrs)
    imu_stamps = imu_true_times + imu_stamp_shift

    est_t, est_p = [], []
    imu_idx = 0
    for ft in frame_times:
        while imu_idx < len(imu_stamps) and imu_stamps[imu_idx] <= ft + abs(imu_stamp_shift) + 1e-9:
            eng.add_imu(imu_stamps[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        q_wb, p_wb = traj.quat(ft), traj.pos(ft)
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
        uv = np.asarray(Xc[:, :2] / Xc[:, 2:3])
        vis = np.asarray(
            (Xc[:, 2] > 0.3) & (np.abs(uv[:, 0]) < 0.82) & (np.abs(uv[:, 1]) < 0.55)
        )
        sel = np.flatnonzero(vis)[: CFG.max_points - 8]
        M = CFG.max_points
        pt_ids = np.full(M, -1, np.int32)
        pt_rays = np.zeros((M, 3))
        pt_rays[:, 2] = 1.0
        pt_ids[: len(sel)] = sel
        pt_rays[: len(sel), 0:2] = uv[sel]
        if select_fn is not None:
            pt_ids = select_fn(ft, pt_ids, pt_rays)
        out = eng.add_frame(ft, pt_ids, pt_rays)
        if out is not None and eng.initialized:
            est_t.append(ft)
            est_p.append(np.asarray(out.p))
    gt_p = np.stack([np.asarray(traj.pos(t)) for t in est_t]) if est_t else None
    return est_t, (np.stack(est_p) if est_p else None), gt_p


@pytest.mark.slow
def test_extrinsic_mode2_converges_from_unknown_rotation():
    """No q_ic given -> mode 2: hand-eye must recover R_BC during the fill
    phase, then initialization proceeds and tracks accurately."""
    eng = VioEngine(CFG, imu_mod.default_params(), q_ic=None, p_ic=None)
    assert eng.estimate_extrinsic == 2 and not eng.extrinsic_ok
    est_t, p_est, p_gt = drive(eng, duration=7.0)
    assert eng.extrinsic_ok, "hand-eye never converged"
    assert eng.initialized
    # recovered rotation within 3 degrees of truth
    q_est = np.asarray(eng.state.q_ic)
    dq = geo.quat_mul(geo.quat_conj(jnp.asarray(q_est)), Q_IC)
    ang = np.degrees(2.0 * np.arccos(min(1.0, abs(float(dq[0])))))
    assert ang < 3.0, f"extrinsic rotation error {ang:.2f} deg"
    ate = ev.ate_rmse(p_est, p_gt, align=True)
    assert ate < 0.15, f"ATE {ate:.4f} m"


@pytest.mark.slow
def test_time_offset_recovered_within_2ms():
    """IMU clock leads the camera clock by 4 ms; the rotation-curve ICP must
    recover it and initialization must still succeed."""
    td_true = 0.004
    eng = VioEngine(
        CFG, imu_mod.default_params(), q_ic=Q_IC, p_ic=P_IC, estimate_td=True
    )
    est_t, p_est, p_gt = drive(eng, duration=9.0, imu_stamp_shift=td_true)
    assert eng._td_solved, "time offset never solved"
    assert abs(eng.td - td_true) < 0.002, f"td {eng.td*1e3:.2f} ms vs {td_true*1e3} ms"
    assert eng.initialized
    ate = ev.ate_rmse(p_est, p_gt, align=True)
    assert ate < 0.15, f"ATE {ate:.4f} m"


@pytest.mark.slow
def test_selector_preserves_accuracy_under_budget():
    """Route ground-truth candidates through the system's jitted selector
    with a 48-feature budget; ATE must stay within the clean-sequence class."""
    from vplines_slam_tpu.models import camera as cam_mod
    from vplines_slam_tpu.models import selector as sel_mod
    from vplines_slam_tpu.pipeline.system import SlamSystem

    cam = cam_mod.pinhole(460.0, 460.0, 376.0, 240.0, width=752, height=480)
    sys_ = SlamSystem(
        cam, window_cfg=CFG, q_ic=Q_IC, p_ic=P_IC,
        use_feature_selector=True,
        selector_cfg=sel_mod.SelectorConfig(max_features=48, init_threshold=10),
        use_loop_closure=False, dtype=jnp.float64,
    )
    eng = sys_.vio
    n_kept = []

    def select_fn(t, ids, rays):
        if not eng.initialized or len(eng._imu_acc) < 2:
            return ids
        acc_mean = jnp.asarray(np.mean(np.stack(eng._imu_acc), axis=0))
        gyr_mean = jnp.asarray(np.mean(np.stack(eng._imu_gyr), axis=0))
        dt = t - (eng.last_frame_time or t - 0.1)
        ids2 = sys_._jit_select(
            jnp.asarray(ids, jnp.int32), jnp.asarray(rays),
            eng.state, eng.data, acc_mean, gyr_mean, jnp.asarray(dt),
        )
        ids2 = np.asarray(ids2)
        n_kept.append(int((ids2 >= 0).sum()))
        # tracked features must always survive selection
        tracked = np.intersect1d(ids[ids >= 0], np.asarray(eng.data.pt_id))
        assert np.isin(tracked, ids2).all()
        return ids2

    est_t, p_est, p_gt = drive(eng, duration=6.0, select_fn=select_fn)
    assert eng.initialized
    assert n_kept and max(n_kept) <= 48 + 1, "budget exceeded"
    ate = ev.ate_rmse(p_est, p_gt, align=True)
    assert ate < 0.08, f"ATE {ate:.4f} m with selector"
