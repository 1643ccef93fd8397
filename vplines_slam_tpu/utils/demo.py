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
    """Device-side renderer of a static landmark world: gaussian blobs in a
    WORLD-ANCHORED textured room (cylinder wall + floor + ceiling, ray-cast
    per pixel) — enough structure for the KLT corner front-end AND the
    EDLine/BRIEF paths.  One jitted program per frame; render on-device
    (images never cross the host boundary on the TPU path).

    The background MUST be world-anchored, not a screen-space texture: BRIEF
    samples around a tiny blob land mostly on background, so a screen-fixed
    texture makes descriptors encode SCREEN position — exact revisits match
    (identical pixels) but a drift-shifted revisit matches the WRONG
    landmarks sitting at the old screen positions (measured: 30/48 "matches"
    with 0 PnP inliers through the full SlamSystem).  Ray-cast world texture
    moves with the scene, so descriptors survive sub-meter viewpoint shifts
    — the property every real environment has."""

    def __init__(self, cam, q_ic, p_ic, n_pts=700, seed=4,
                 box=((-4, 4), (-4, 4), (-1, 2.5)), dtype=jnp.float32,
                 wall_radius=8.0, floor_z=-1.4, ceil_z=3.2, tex_octaves=14):
        import numpy as _np

        self.cam = cam
        H, W = int(cam.height), int(cam.width)
        self.H, self.W = H, W
        rng = _np.random.default_rng(seed)
        # landmark blobs live mostly ON the room surfaces (wall 40% / floor
        # 25% / ceiling 10%), with 25% floating in the interior box.  A
        # floating blob's BRIEF patch is dominated by background at a
        # DIFFERENT depth, so ~0.1 m of viewpoint shift scrambles its
        # descriptor (measured: margin-gated matches 52→15→4 at 0.06/0.13/
        # 0.19 m offsets with all-floating blobs); surface-mounted corners —
        # the overwhelming majority in real scenes — keep their local patch
        # rigid and match across revisit-scale offsets.
        n_wall = int(0.40 * n_pts)
        n_floor = int(0.25 * n_pts)
        n_ceil = int(0.10 * n_pts)
        n_int = n_pts - n_wall - n_floor - n_ceil
        th = rng.uniform(-_np.pi, _np.pi, n_wall)
        zw = rng.uniform(floor_z + 0.2, ceil_z - 0.2, n_wall)
        rw = wall_radius - 0.05
        Xw = _np.stack([rw * _np.cos(th), rw * _np.sin(th), zw], 1)
        phf = rng.uniform(-_np.pi, _np.pi, n_floor)
        rf = _np.sqrt(rng.uniform(0.05, 1.0, n_floor)) * (wall_radius - 0.3)
        Xf = _np.stack(
            [rf * _np.cos(phf), rf * _np.sin(phf),
             _np.full(n_floor, floor_z + 0.05)], 1
        )
        phc = rng.uniform(-_np.pi, _np.pi, n_ceil)
        rc = _np.sqrt(rng.uniform(0.05, 1.0, n_ceil)) * (wall_radius - 0.3)
        Xc_ = _np.stack(
            [rc * _np.cos(phc), rc * _np.sin(phc),
             _np.full(n_ceil, ceil_z - 0.05)], 1
        )
        Xi = _np.asarray(syn.scatter_landmarks(n_int, seed=seed, box=box))
        self.X = jnp.asarray(_np.concatenate([Xw, Xf, Xc_, Xi], 0), dtype)
        self.brightness = jnp.asarray(rng.uniform(0.35, 0.9, n_pts), dtype)
        self.q_ic = jnp.asarray(q_ic, dtype)
        self.p_ic = jnp.asarray(p_ic, dtype)
        self.dtype = dtype
        self.wall_radius = wall_radius
        self.floor_z = floor_z
        self.ceil_z = ceil_z
        # random cosine bank over surface coords (meters): frequencies span
        # 0.3-5 cycles/m -> 10-150 px wavelength at the 3-11 m depths this
        # room is seen at (BRIEF pattern radius ~15 px, blur sigma 2)
        K = tex_octaves
        f = rng.uniform(0.3, 5.0, (K, 2)) * rng.choice([-1.0, 1.0], (K, 2))
        self.tex_f = jnp.asarray(2.0 * _np.pi * f, dtype)
        self.tex_ph = jnp.asarray(rng.uniform(0, 2 * _np.pi, K), dtype)
        self.tex_a = jnp.asarray(
            rng.uniform(0.5, 1.0, K) / _np.sqrt(_np.arange(1, K + 1)), dtype
        )
        self._render = jax.jit(self._render_impl)

    def _surface_texture(self, u, v, sel):
        """Band-limited random field over surface coords (u, v) in meters;
        sel in {0,1,2} offsets the phase bank so wall/floor/ceiling differ.
        Adds world-anchored dark grid lines (straight 3D lines for EDLine)."""
        ph = self.tex_ph + sel * 2.1
        s = jnp.einsum(
            "k,hwk->hw",
            self.tex_a,
            jnp.cos(
                u[..., None] * self.tex_f[:, 0]
                + v[..., None] * self.tex_f[:, 1]
                + ph
            ),
        )
        # high gain -> quasi-binary patches with crisp boundaries: BRIEF
        # pairwise comparisons saturate (bits stable under small viewpoint
        # shifts) instead of hovering near zero difference on a smooth field
        # (measured: gain 0.9 gave 14 margin-gated matches at a 0.13 m
        # revisit offset; saturated patches are the behavior of real scenes)
        t = 0.5 + 0.5 * jnp.tanh(s * 3.0)
        # dark grid every 1.5 m (walls) — crisp straight edges in the world
        gu = jnp.abs(jnp.mod(u, 1.5) - 0.75) > 0.71
        gv = jnp.abs(jnp.mod(v, 1.5) - 0.75) > 0.71
        return t * jnp.where(gu | gv, 0.3, 1.0)

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

        # ---- world-anchored background: per-pixel ray cast ----------------
        cam_ = self.cam
        R_wc = geo.quat_to_rot(geo.quat_conj(q_cw)).astype(dtype)  # cam->world
        p_c = (-(R_wc @ p_cw)).astype(dtype)  # camera center in world
        dx = (xx - dtype(cam_.cx)) / dtype(cam_.fx)
        dy = (yy - dtype(cam_.cy)) / dtype(cam_.fy)
        d = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)  # [H,W,3] cam rays
        dw = jnp.einsum("ij,hwj->hwi", R_wc, d)
        eps = dtype(1e-9)
        # cylinder |p_xy + t d_xy| = R (camera is inside: one positive root)
        a = dw[..., 0] ** 2 + dw[..., 1] ** 2
        b = 2.0 * (p_c[0] * dw[..., 0] + p_c[1] * dw[..., 1])
        c = p_c[0] ** 2 + p_c[1] ** 2 - dtype(self.wall_radius) ** 2
        disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))
        t_wall = (-b + disc) / (2.0 * jnp.maximum(a, eps))
        # floor / ceiling planes
        t_floor = (dtype(self.floor_z) - p_c[2]) / jnp.where(
            jnp.abs(dw[..., 2]) < eps, -eps, dw[..., 2]
        )
        t_ceil = (dtype(self.ceil_z) - p_c[2]) / jnp.where(
            jnp.abs(dw[..., 2]) < eps, eps, dw[..., 2]
        )
        big = dtype(1e6)
        t_floor = jnp.where(t_floor > 0, t_floor, big)
        t_ceil = jnp.where(t_ceil > 0, t_ceil, big)
        t_wall = jnp.where(t_wall > 0, t_wall, big)
        t_hit = jnp.minimum(t_wall, jnp.minimum(t_floor, t_ceil))
        w = p_c[None, None, :] + t_hit[..., None] * dw  # world hit point
        # surface coords: wall (arc-length, z); floor/ceiling (x, y)
        u_wall = jnp.arctan2(w[..., 1], w[..., 0]) * dtype(self.wall_radius)
        tex_wall = self._surface_texture(u_wall, w[..., 2], 0)
        tex_floor = self._surface_texture(w[..., 0], w[..., 1], 1)
        tex_ceil = self._surface_texture(w[..., 0], w[..., 1], 2)
        tex = jnp.where(
            t_hit == t_wall, tex_wall,
            jnp.where(t_hit == t_floor, tex_floor, tex_ceil),
        )
        # mild distance shading keeps blob peaks the brightest features
        shade = 1.0 / (1.0 + 0.06 * t_hit)
        bg = (0.10 + 0.38 * tex) * shade

        def blob(k, im):
            d2 = (xx - uv[k, 0]) ** 2 + (yy - uv[k, 1]) ** 2
            return im + vis[k] * self.brightness[k] * jnp.exp(-d2 / 4.5)

        n = self.X.shape[0]
        return jnp.clip(jax.lax.fori_loop(0, n, blob, bg), 0.0, 1.0)

    def render(self, q_wb, p_wb):
        return self._render(
            jnp.asarray(q_wb, self.dtype), jnp.asarray(p_wb, self.dtype)
        )
