"""Builders for pre-filled synthetic windows (bench / graft-entry / tests)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..estimator import window as win_mod
from ..estimator.slide import ingest_frame, set_imu_interval
from ..models import imu as imu_mod
from . import geometry as geo
from . import synthetic as syn


def forward_camera_extrinsic(dtype=jnp.float64):
    R_BC = jnp.asarray(
        [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], dtype
    )
    return geo.rot_to_quat(R_BC), jnp.asarray([0.05, 0.02, 0.03], dtype)


def _project_segment(q_cw, p_cw, a, b, fov=(0.8, 0.55)):
    """Project + Liang-Barsky-clip a 3D segment to the normalized FOV box.
    Returns ([x0,y0,x1,y1], ok)."""
    ac = np.asarray(geo.transform_point(q_cw, p_cw, a))
    bc = np.asarray(geo.transform_point(q_cw, p_cw, b))
    if ac[2] < 0.4 or bc[2] < 0.4:
        return None, False
    p0 = ac[:2] / ac[2]
    p1 = bc[:2] / bc[2]
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
    if t1 - t0 < 0.15:
        return None, False
    q0 = p0 + t0 * d
    q1 = p0 + t1 * d
    return np.asarray([q0[0], q0[1], q1[0], q1[1]]), True


def synthetic_window(
    cfg: win_mod.WindowConfig,
    dtype=jnp.float64,
    n_landmarks=200,
    frame_dt=0.35,
    imu_per_interval=None,
    seed=0,
    perturb=0.0,
    n_lines=0,
):
    """A fully-populated window (states at truth, tracks ingested, IMU stored,
    depths triangulated).  Returns (state, data, params)."""
    traj = syn.figure8_trajectory()
    X = syn.scatter_landmarks(n_landmarks, seed=seed, box=((-4, 4), (-4, 4), (-1, 3)))
    segs3d = np.asarray(syn.scatter_lines(n_lines, seed=seed + 3)) if n_lines else None
    if n_lines:
        dirs3d = segs3d[:, 1] - segs3d[:, 0]
        dirs3d = dirs3d / np.linalg.norm(dirs3d, axis=1, keepdims=True)
    params = imu_mod.default_params(dtype)
    q_ic, p_ic = forward_camera_extrinsic(dtype)

    state = win_mod.empty_state(cfg, dtype)._replace(q_ic=q_ic, p_ic=p_ic)
    data = win_mod.empty_tracks(cfg, dtype)
    nf = cfg.nf
    n_imu = imu_per_interval or min(cfg.max_imu, int(frame_dt * 200))
    times = [frame_dt * k for k in range(nf)]
    for k, t in enumerate(times):
        q_wb = traj.quat(t).astype(dtype)
        p_wb = traj.pos(t).astype(dtype)
        state = state._replace(
            p=state.p.at[k].set(p_wb),
            q=state.q.at[k].set(q_wb),
            v=state.v.at[k].set(syn.world_velocity(traj, t).astype(dtype)),
        )
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, q_ic, p_ic))
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x.astype(dtype)))(X.astype(dtype))
        uv = Xc[:, :2] / Xc[:, 2:3]
        vis = np.asarray(
            (Xc[:, 2] > 0.5) & (jnp.abs(uv[:, 0]) < 0.8) & (jnp.abs(uv[:, 1]) < 0.55)
        )
        sel = np.flatnonzero(vis)[: cfg.max_points - 4]
        ids = np.full(cfg.max_points, -1, np.int32)
        rays = np.zeros((cfg.max_points, 3))
        rays[:, 2] = 1.0
        ids[: len(sel)] = sel
        rays[: len(sel), :2] = np.asarray(uv)[sel]
        ln_args = ()
        if n_lines:
            L = cfg.max_lines
            ln_ids = np.full(L, -1, np.int32)
            ln_obs = np.zeros((L, 4))
            ln_vps = np.zeros((L, 3))
            ln_vps[:, 2] = 1.0
            ln_vpv = np.zeros(L, bool)
            m = 0
            for li in range(len(segs3d)):
                if m >= L - 1:
                    break
                e, ok_seg = _project_segment(
                    q_cw, p_cw,
                    jnp.asarray(segs3d[li, 0], dtype),
                    jnp.asarray(segs3d[li, 1], dtype),
                )
                if ok_seg:
                    ln_ids[m] = li
                    ln_obs[m] = e
                    d_c = np.asarray(
                        geo.quat_rotate(q_cw, jnp.asarray(dirs3d[li], dtype))
                    )
                    if abs(d_c[2]) > 0.1:
                        ln_vps[m] = d_c * np.sign(d_c[2])
                        ln_vpv[m] = li % 4 < 3
                    m += 1
            ln_args = (
                jnp.asarray(ln_ids), jnp.asarray(ln_obs, dtype),
                jnp.asarray(ln_vps, dtype), jnp.asarray(ln_vpv),
            )
        data = ingest_frame(
            data, cfg, k, jnp.asarray(ids), jnp.asarray(rays, dtype), *ln_args
        )
        if k > 0:
            ts = jnp.linspace(times[k - 1], t, n_imu + 1).astype(dtype)
            accs, gyrs = syn.imu_samples(traj, ts)
            pad = cfg.max_imu - n_imu
            dts = jnp.concatenate([jnp.diff(ts), jnp.zeros(pad, dtype)])
            accs = jnp.concatenate([accs.astype(dtype), jnp.zeros((pad, 3), dtype)])
            gyrs = jnp.concatenate([gyrs.astype(dtype), jnp.zeros((pad, 3), dtype)])
            mask = jnp.concatenate([jnp.ones(n_imu, bool), jnp.zeros(pad, bool)])
            data = set_imu_interval(data, k - 1, dts, accs, gyrs, mask, params=params)
    data = win_mod.triangulate_points(state, data, cfg)
    if n_lines:
        data = win_mod.triangulate_lines(state, data, cfg)

    if perturb:
        rng = np.random.default_rng(seed + 7)
        dp = jnp.asarray(rng.standard_normal((nf, 3)) * perturb, dtype).at[0].set(0.0)
        state = state._replace(p=state.p + dp)
    return state, data, params
