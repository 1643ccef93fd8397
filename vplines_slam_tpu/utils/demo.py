"""Builders for pre-filled synthetic windows (bench / graft-entry / tests).

Performance note: this builder used to dispatch hundreds of tiny eager JAX
ops per frame (slot ingestion, per-segment projection, per-interval
preintegration), which cost minutes on a virtual 8-device CPU backend.  All
device work is now grouped into a handful of jitted programs (batched frame
projection, one ingest program reused across frames, one IMU-interval
program) so the builder is trace-cache-bound, not dispatch-bound.
"""

from __future__ import annotations

from functools import partial

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


# jitted once per (shapes, cfg) signature; reused across the frame loop and
# across calls with the same window configuration
_ingest_jit = jax.jit(ingest_frame, static_argnums=(1,))
_imu_jit = jax.jit(set_imu_interval)
_tri_pts_jit = jax.jit(win_mod.triangulate_points, static_argnums=(2,))
_tri_lns_jit = jax.jit(win_mod.triangulate_lines, static_argnums=(2,))


@jax.jit
def _batched_frame_obs(qs_wb, ps_wb, X, q_ic, p_ic):
    """Camera-frame geometry for every window frame in ONE program.

    Returns per-frame uv [nf,N,2], vis [nf,N], and the camera-from-world
    poses (q_cw [nf,4], p_cw [nf,3])."""

    def one(q_wb, p_wb):
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, q_ic, p_ic))
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
        uv = Xc[:, :2] / Xc[:, 2:3]
        vis = (Xc[:, 2] > 0.5) & (jnp.abs(uv[:, 0]) < 0.8) & (jnp.abs(uv[:, 1]) < 0.55)
        return uv, vis, q_cw, p_cw

    return jax.vmap(one)(qs_wb, ps_wb)


@jax.jit
def _batched_segments(q_cw, p_cw, seg_a, seg_b, dirs):
    """Segment endpoints + line directions in every camera frame, one program.
    Returns ac [nf,S,3], bc [nf,S,3], d_c [nf,S,3]."""

    def one(q, p):
        ac = jax.vmap(lambda x: geo.transform_point(q, p, x))(seg_a)
        bc = jax.vmap(lambda x: geo.transform_point(q, p, x))(seg_b)
        dc = jax.vmap(lambda v: geo.quat_rotate(q, v))(dirs)
        return ac, bc, dc

    return jax.vmap(one)(q_cw, p_cw)


def _clip_segment_np(ac, bc, fov=(0.8, 0.55)):
    """Liang-Barsky clip of a camera-frame 3D segment to the normalized FOV
    box (host-side float math on tiny arrays).  Returns ([x0,y0,x1,y1], ok)."""
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

    nf = cfg.nf
    n_imu = imu_per_interval or min(cfg.max_imu, int(frame_dt * 200))
    times = np.asarray([frame_dt * k for k in range(nf)])

    # ground-truth states and per-frame projections, each in one program
    ts = jnp.asarray(times, dtype)
    qs_wb = jax.vmap(lambda t: traj.quat(t).astype(dtype))(ts)
    ps_wb = jax.vmap(lambda t: traj.pos(t).astype(dtype))(ts)
    vs_wb = jax.vmap(lambda t: syn.world_velocity(traj, t).astype(dtype))(ts)
    Xd = jnp.asarray(np.asarray(X), dtype)
    uv_all, vis_all, q_cw_all, p_cw_all = _batched_frame_obs(
        qs_wb, ps_wb, Xd, q_ic, p_ic
    )
    uv_np = np.asarray(uv_all)
    vis_np = np.asarray(vis_all)

    if n_lines:
        ac_all, bc_all, dc_all = _batched_segments(
            q_cw_all, p_cw_all,
            jnp.asarray(segs3d[:, 0], dtype), jnp.asarray(segs3d[:, 1], dtype),
            jnp.asarray(dirs3d, dtype),
        )
        ac_np, bc_np, dc_np = map(np.asarray, (ac_all, bc_all, dc_all))

    state = win_mod.empty_state(cfg, dtype)._replace(
        q_ic=q_ic, p_ic=p_ic, p=ps_wb, q=qs_wb, v=vs_wb
    )
    data = win_mod.empty_tracks(cfg, dtype)

    # all IMU sampling in one call: [(nf-1) x (n_imu+1)] sample times
    seg_times = np.stack(
        [np.linspace(times[k], times[k + 1], n_imu + 1) for k in range(nf - 1)]
    )
    accs_all, gyrs_all = syn.imu_samples(traj, jnp.asarray(seg_times.ravel(), dtype))
    accs_all = np.asarray(accs_all).reshape(nf - 1, n_imu + 1, 3)
    gyrs_all = np.asarray(gyrs_all).reshape(nf - 1, n_imu + 1, 3)
    pad = cfg.max_imu - n_imu
    imu_mask = jnp.asarray(
        np.concatenate([np.ones(n_imu, bool), np.zeros(pad, bool)])
    )

    for k in range(nf):
        sel = np.flatnonzero(vis_np[k])[: cfg.max_points - 4]
        ids = np.full(cfg.max_points, -1, np.int32)
        rays = np.zeros((cfg.max_points, 3))
        rays[:, 2] = 1.0
        ids[: len(sel)] = sel
        rays[: len(sel), :2] = uv_np[k][sel]
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
                e, ok_seg = _clip_segment_np(ac_np[k, li], bc_np[k, li])
                if ok_seg:
                    ln_ids[m] = li
                    ln_obs[m] = e
                    d_c = dc_np[k, li]
                    if abs(d_c[2]) > 0.1:
                        ln_vps[m] = d_c * np.sign(d_c[2])
                        ln_vpv[m] = li % 4 < 3
                    m += 1
            ln_args = (
                jnp.asarray(ln_ids), jnp.asarray(ln_obs, dtype),
                jnp.asarray(ln_vps, dtype), jnp.asarray(ln_vpv),
            )
        data = _ingest_jit(
            data, cfg, k, jnp.asarray(ids), jnp.asarray(rays, dtype), *ln_args
        )
        if k > 0:
            dts = np.concatenate([np.diff(seg_times[k - 1]), np.zeros(pad)])
            accs = np.concatenate([accs_all[k - 1], np.zeros((pad, 3))])
            gyrs = np.concatenate([gyrs_all[k - 1], np.zeros((pad, 3))])
            data = _imu_jit(
                data, k - 1, jnp.asarray(dts, dtype), jnp.asarray(accs, dtype),
                jnp.asarray(gyrs, dtype), imu_mask, params=params,
            )
    data = _tri_pts_jit(state, data, cfg)
    if n_lines:
        data = _tri_lns_jit(state, data, cfg)

    if perturb:
        rng = np.random.default_rng(seed + 7)
        dp = jnp.asarray(rng.standard_normal((nf, 3)) * perturb, dtype).at[0].set(0.0)
        state = state._replace(p=state.p + dp)
    return state, data, params


# ---------------------------------------------------------------------------
# rendered blob-world (system-level benches / e2e accuracy artifacts)
# ---------------------------------------------------------------------------


def make_texture(rng, H, W, grid=True):
    """Multi-octave random texture; optional dark grid lines (line-rich
    world for the EDLine front-end)."""
    img = np.zeros((H, W), np.float32)
    for o in range(5):
        l = rng.standard_normal((H // (2**o) + 1, W // (2**o) + 1))
        img += np.kron(l, np.ones((2**o, 2**o)))[:H, :W] / (o + 1)
    img = (img - img.min()) / (img.max() - img.min())
    img = 0.25 + 0.5 * img
    if grid:
        for y in range(40, H, 96):
            img[y : y + 3, :] *= 0.25
        for x in range(40, W, 112):
            img[:, x : x + 3] *= 0.25
    return img


class BlobWorldRenderer:
    """Device-side renderer of a static landmark world: gaussian blobs over
    a dim grid texture — enough structure for the KLT corner front-end AND
    the EDLine/BRIEF paths.  One jitted program per frame; render on-device
    (images never cross the host boundary on the TPU path)."""

    def __init__(self, cam, q_ic, p_ic, n_pts=700, seed=4,
                 box=((-4, 4), (-4, 4), (-1, 2.5)), dtype=jnp.float32):
        import numpy as _np

        self.cam = cam
        H, W = int(cam.height), int(cam.width)
        self.H, self.W = H, W
        rng = _np.random.default_rng(seed)
        self.X = jnp.asarray(
            _np.asarray(syn.scatter_landmarks(n_pts, seed=seed, box=box)), dtype
        )
        self.brightness = jnp.asarray(rng.uniform(0.35, 0.9, n_pts), dtype)
        self.bg = jnp.asarray(make_texture(rng, H, W, grid=True) * 0.12, dtype)
        self.q_ic = jnp.asarray(q_ic, dtype)
        self.p_ic = jnp.asarray(p_ic, dtype)
        self.dtype = dtype
        self._render = jax.jit(self._render_impl)

    def _render_impl(self, q_wb, p_wb):
        from ..models import camera as cam_mod

        H, W, dtype = self.H, self.W, self.dtype
        q_cw, p_cw = geo.pose_inverse(
            *geo.pose_compose(q_wb, p_wb, self.q_ic, self.p_ic)
        )
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(self.X)
        uv, _ = cam_mod.project(self.cam, Xc)
        # camera intrinsics may be f64 (x64 tests): pin the render dtype so
        # the fori_loop carry type stays stable
        uv = uv.astype(dtype)
        vis = (
            (Xc[:, 2] > 0.5)
            & (uv[:, 0] > 5) & (uv[:, 0] < W - 5)
            & (uv[:, 1] > 5) & (uv[:, 1] < H - 5)
        )
        yy, xx = jnp.meshgrid(
            jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
        )

        def blob(k, im):
            d2 = (xx - uv[k, 0]) ** 2 + (yy - uv[k, 1]) ** 2
            return im + vis[k] * self.brightness[k] * jnp.exp(-d2 / 4.5)

        n = self.X.shape[0]
        return jnp.clip(jax.lax.fori_loop(0, n, blob, self.bg), 0.0, 1.0)

    def render(self, q_wb, p_wb):
        return self._render(
            jnp.asarray(q_wb, self.dtype), jnp.asarray(p_wb, self.dtype)
        )
