"""Point+line(+VP) VIO end-to-end (BASELINE.json configs 2-3, synthetic)."""

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

CFG = WindowConfig(max_points=80, max_lines=24, max_imu=32)


def project_segment(q_cw, p_cw, a, b, fov=(0.8, 0.55)):
    """Project + clip the segment to the FOV box (front-ends emit image-
    clipped segments; clipped endpoints still lie on the projected line, so
    line/VP residuals and two-plane triangulation are unaffected)."""
    ac = np.asarray(geo.transform_point(q_cw, p_cw, a))
    bc = np.asarray(geo.transform_point(q_cw, p_cw, b))
    if ac[2] < 0.4 or bc[2] < 0.4:
        return None, False
    p0 = ac[:2] / ac[2]
    p1 = bc[:2] / bc[2]
    # Liang-Barsky against [-fx,fx]x[-fy,fy]
    d = p1 - p0
    t0, t1 = 0.0, 1.0
    for dim in range(2):
        lo, hi = -fov[dim], fov[dim]
        if abs(d[dim]) < 1e-12:
            if p0[dim] < lo or p0[dim] > hi:
                return None, False
        else:
            ta = (lo - p0[dim]) / d[dim]
            tb = (hi - p0[dim]) / d[dim]
            ta, tb = min(ta, tb), max(ta, tb)
            t0, t1 = max(t0, ta), min(t1, tb)
    if t1 - t0 < 0.15:  # too little of the segment visible
        return None, False
    q0 = p0 + t0 * d
    q1 = p0 + t1 * d
    return jnp.asarray([q0[0], q0[1], q1[0], q1[1]]), True


@pytest.mark.slow
def test_vio_with_lines_and_vps():
    duration, frame_hz, imu_hz = 5.0, 10, 200
    traj = syn.figure8_trajectory()
    X = syn.scatter_landmarks(300, seed=2)
    segs3d = np.asarray(syn.scatter_lines(40, seed=3))  # [L, 2, 3]
    # structural direction of each line (for VP observations)
    dirs3d = segs3d[:, 1] - segs3d[:, 0]
    dirs3d = dirs3d / np.linalg.norm(dirs3d, axis=1, keepdims=True)

    eng = VioEngine(CFG, imu_mod.default_params(), q_ic=Q_IC, p_ic=P_IC,
                    use_lines=True)

    frame_times = np.arange(0.0, duration, 1.0 / frame_hz)
    imu_times = np.arange(0.0, duration + 1e-9, 1.0 / imu_hz)
    accs, gyrs = syn.imu_samples(traj, jnp.asarray(imu_times))
    accs, gyrs = np.asarray(accs), np.asarray(gyrs)

    est_t, est_p = [], []
    imu_idx = 0
    for ft in frame_times:
        while imu_idx < len(imu_times) and imu_times[imu_idx] <= ft + 1e-9:
            eng.add_imu(imu_times[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        q_wb, p_wb = traj.quat(ft), traj.pos(ft)
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))

        # points
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
        uv = np.asarray(Xc[:, :2] / Xc[:, 2:3])
        vis = np.asarray(
            (Xc[:, 2] > 0.3) & (np.abs(uv[:, 0]) < 0.82) & (np.abs(uv[:, 1]) < 0.55)
        )
        sel = np.flatnonzero(vis)[: CFG.max_points - 8]
        ids = np.full(CFG.max_points, -1, np.int32)
        rays = np.zeros((CFG.max_points, 3))
        rays[:, 2] = 1.0
        ids[: len(sel)] = sel
        rays[: len(sel), :2] = uv[sel]

        # lines + their VP directions in camera frame
        L = CFG.max_lines
        ln_ids = np.full(L, -1, np.int32)
        ln_obs = np.zeros((L, 4))
        ln_vps = np.zeros((L, 3))
        ln_vps[:, 2] = 1.0
        ln_vpv = np.zeros(L, bool)
        n = 0
        for li in range(len(segs3d)):
            if n >= L - 2:
                break
            e, ok = project_segment(
                q_cw, p_cw, jnp.asarray(segs3d[li, 0]), jnp.asarray(segs3d[li, 1])
            )
            if ok:
                ln_ids[n] = li
                ln_obs[n] = np.asarray(e)
                d_c = np.asarray(geo.quat_rotate(q_cw, jnp.asarray(dirs3d[li])))
                if abs(d_c[2]) > 0.1:
                    ln_vps[n] = d_c * np.sign(d_c[2])
                    ln_vpv[n] = li % 4 < 3  # structural lines carry a VP
                n += 1

        out = eng.add_frame(ft, ids, rays, ln_ids=ln_ids, ln_obs=ln_obs,
                            ln_vps=ln_vps, ln_vp_valid=ln_vpv)
        if out is not None and eng.initialized:
            est_t.append(ft)
            est_p.append(np.asarray(out.p))

    assert eng.initialized
    n_lines = int(jnp.sum(eng.data.ln_solved))
    assert n_lines >= 5, f"only {n_lines} lines triangulated"
    gt = np.stack([np.asarray(traj.pos(t)) for t in est_t])
    ate = ev.ate_rmse(np.stack(est_p), gt)
    assert ate < 0.05, f"ATE {ate*100:.1f} cm"
