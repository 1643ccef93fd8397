"""Line-feature front-end: undistort -> detect -> match -> h/v caps -> VP.

Device-resident re-design of
``feature_tracker/src/line_feature_tracker.cpp`` (readImage:56: remap
undistort -> CLAHE -> EDLine -> match vs previous frame -> tracked/new split
with h/v classification caps (:128-226) -> VP detection -> per-line VP
attach) + the node's normalized-endpoint output
(line_feature_tracker_node.cpp:64-163).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import camera as cam_mod
from ..ops import line_match as lmatch_mod
from ..ops import lines as lines_mod
from ..ops import vp as vp_mod
from ..ops.image import build_remap_plan, clahe, remap_static


class LineTrackerConfig(NamedTuple):
    max_lines: int = 64  # track capacity
    max_h: int = 40  # max_h_lines cap
    max_v: int = 40  # max_v_lines cap
    detect: lines_mod.LineDetectConfig = lines_mod.LineDetectConfig()
    match: lmatch_mod.LineMatchConfig = lmatch_mod.LineMatchConfig()
    vp: vp_mod.VPConfig = vp_mod.VPConfig()
    equalize: bool = True
    use_vp: bool = True


class LineTrackerState(NamedTuple):
    segs: jnp.ndarray  # [L, 4] pixel endpoints (undistorted image)
    ids: jnp.ndarray  # [L] int32 (-1 empty)
    next_id: jnp.ndarray
    prev_img: jnp.ndarray
    has_prev: jnp.ndarray
    vps_prev: jnp.ndarray  # [3, 3]
    had_vps: jnp.ndarray


class LineTrackerOutput(NamedTuple):
    ids: jnp.ndarray  # [L]
    endpoints: jnp.ndarray  # [L, 4] normalized-plane (u1,v1,u2,v2)
    vp_dirs: jnp.ndarray  # [L, 3] homogeneous VP on normalized plane
    vp_valid: jnp.ndarray  # [L]
    segs_px: jnp.ndarray  # [L, 4] pixel endpoints
    valid: jnp.ndarray


def init_state(cfg: LineTrackerConfig, H, W, dtype=jnp.float32) -> LineTrackerState:
    L = cfg.max_lines
    return LineTrackerState(
        segs=jnp.zeros((L, 4), dtype),
        ids=jnp.full((L,), -1, jnp.int32),
        next_id=jnp.asarray(0, jnp.int32),
        prev_img=jnp.zeros((H, W), dtype),
        has_prev=jnp.asarray(False),
        vps_prev=jnp.eye(3, dtype=dtype),
        had_vps=jnp.asarray(False),
    )


def step(state: LineTrackerState, img_undist, ideal_cam, cfg: LineTrackerConfig, key):
    """Process one (already undistorted) frame.

    ideal_cam: the pinhole model of the undistorted image (fx, fy, cx, cy).
    """
    dtype = img_undist.dtype
    L = cfg.max_lines
    img = clahe(img_undist) if cfg.equalize else img_undist

    det_cfg = cfg.detect._replace(max_lines=L)
    segs_new, lens_new, valid_new = lines_mod.detect_lines(img, det_cfg)

    # h/v classification caps (top-up priority by length)
    horiz, vert = lines_mod.classify_hv(segs_new, valid_new)
    def cap(mask, kmax):
        r = jnp.where(mask, lens_new, -1.0)
        order = jnp.argsort(-r)
        rank = jnp.zeros(L, jnp.int32).at[order].set(jnp.arange(L, dtype=jnp.int32))
        return mask & (rank < kmax)

    keep = cap(horiz, cfg.max_h) | cap(vert, cfg.max_v) | (
        valid_new & ~horiz & ~vert
    )
    valid_new = valid_new & keep

    # ---- match against previous frame ------------------------------------
    prev_valid = state.ids >= 0

    def matched(_):
        m, votes = lmatch_mod.match_lines(
            state.prev_img, img, state.segs, prev_valid, segs_new, valid_new,
            cfg.match,
        )
        return m

    match = jax.lax.cond(
        state.has_prev, matched, lambda _: jnp.full((L,), -1, jnp.int32), None
    )

    # new-frame slot table: tracked lines inherit ids; untracked detections
    # get fresh ids
    tgt_taken = jnp.zeros(L, bool)
    safe_m = jnp.where(match >= 0, match, 0)
    tgt_taken = tgt_taken.at[safe_m].set(match >= 0)
    inherit_src = jnp.full((L,), -1, jnp.int32)
    inherit_src = inherit_src.at[safe_m].set(
        jnp.where(match >= 0, jnp.arange(L, dtype=jnp.int32), inherit_src[safe_m])
    )
    is_new = valid_new & ~tgt_taken
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    ids_out = jnp.where(
        tgt_taken & valid_new,
        state.ids[jnp.maximum(inherit_src, 0)],
        jnp.where(is_new, state.next_id + new_rank, -1),
    )
    n_new = jnp.sum(is_new.astype(jnp.int32))

    # ---- vanishing points -------------------------------------------------
    if cfg.use_vp:
        vps, vp_id, vp_ok = vp_mod.detect_vps(
            segs_new, valid_new, ideal_cam.fx, ideal_cam.cx, ideal_cam.cy, key,
            cfg.vp,
        )
        vps = vp_mod.vps_temporal_consistency(vps, state.vps_prev, state.had_vps)
        vp_valid = (vp_id < 3) & valid_new & vp_ok
        vp_dirs = vps[jnp.clip(vp_id, 0, 2)]
        # ensure z-positive homogeneous representation
        vp_dirs = vp_dirs * jnp.where(vp_dirs[:, 2:3] < 0, -1.0, 1.0)
    else:
        vps = state.vps_prev
        vp_ok = jnp.asarray(False)
        vp_valid = jnp.zeros(L, bool)
        vp_dirs = jnp.zeros((L, 3), dtype).at[:, 2].set(1.0)

    # ---- normalized endpoints --------------------------------------------
    e1 = cam_mod.lift(ideal_cam, segs_new[:, 0:2])[:, 0:2]
    e2 = cam_mod.lift(ideal_cam, segs_new[:, 2:4])[:, 0:2]
    endpoints = jnp.concatenate([e1, e2], axis=1)

    out = LineTrackerOutput(
        ids=ids_out,
        endpoints=endpoints,
        vp_dirs=vp_dirs,
        vp_valid=vp_valid,
        segs_px=segs_new,
        valid=ids_out >= 0,
    )
    state_new = LineTrackerState(
        segs=segs_new,
        ids=ids_out,
        next_id=(state.next_id + n_new).astype(state.next_id.dtype),
        prev_img=img,
        has_prev=jnp.asarray(True),
        vps_prev=jnp.where(vp_ok, vps, state.vps_prev),
        had_vps=state.had_vps | vp_ok,
    )
    return state_new, out


class LineTrackerFrontend:
    """Host wrapper: undistorts via the camera's rectify map, then runs the
    jitted step."""

    def __init__(self, cam: cam_mod.CameraModel, cfg: LineTrackerConfig = LineTrackerConfig(),
                 dtype=jnp.float32, seed=0):
        self.cfg = cfg
        self.map_xy = cam_mod.undistort_rectify_map(cam).astype(dtype)
        # banded two-pass remap (RemapPlan): dense-gather cv::remap parity at
        # VPU shift-add cost; for an undistorted pinhole the plan degenerates
        # to (near-)identity and is effectively free
        self.remap_plan = build_remap_plan(self.map_xy)
        self.ideal = cam_mod.pinhole(
            cam.fx, cam.fy, cam.cx, cam.cy, width=cam.width, height=cam.height
        )
        self.state = init_state(cfg, cam.height, cam.width, dtype)
        self._key = jax.random.PRNGKey(seed)
        self._step = jax.jit(
            lambda st, img, key: step(
                st, remap_static(img, self.remap_plan), self.ideal, cfg, key
            )
        )

    def process(self, t, img):
        self._key, k = jax.random.split(self._key)
        self.state, out = self._step(self.state, img, k)
        return out
