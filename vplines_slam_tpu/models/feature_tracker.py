"""Point-feature front-end: CLAHE -> KLT -> F-RANSAC -> spaced top-up.

Device-resident re-design of ``feature_tracker/src/feature_tracker.cpp``
(readImage:107: CLAHE -> pyramidal LK -> rejectWithF:226 F-matrix RANSAC in
virtual-focal pixel space -> setMask spacing -> goodFeaturesToTrack top-up ->
undistortedPoints:317 normalized coords + per-feature velocity) and the node
wrapper's id management (feature_tracker_node.cpp).

The whole per-frame update is one jitted program over fixed-capacity slot
arrays; ids are assigned with a cumsum instead of a global counter mutex.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import camera as cam_mod
from ..ops import corners as corners_mod
from ..ops import klt as klt_mod
from ..ops import mvg
from ..ops.image import clahe


class TrackerConfig(NamedTuple):
    max_features: int = 150  # max_cnt (euroc_config.yaml)
    min_dist: int = 30  # min_dist
    f_threshold: float = 1.0  # px at 460 virtual focal (F_threshold)
    equalize: bool = True
    ransac_hyps: int = 32
    quality: float = 0.01  # GFTT quality level (relative to max response)
    # FISHEYE (parameters.cpp:71-83): confine tracking/detection to the
    # circular valid region (the reference loads fisheye_mask.jpg; a
    # centered circle is generated when no mask image is supplied)
    fisheye: bool = False
    klt: klt_mod.KLTConfig = klt_mod.KLTConfig()


def circular_fisheye_mask(H, W, radius=None, dtype=jnp.float32):
    """Centered circular 0/1 mask (the shipped fisheye_mask.jpg analog)."""
    r = radius if radius is not None else 0.5 * min(H, W) - 4.0
    yy = jnp.arange(H, dtype=dtype)[:, None] - (H - 1) / 2.0
    xx = jnp.arange(W, dtype=dtype)[None, :] - (W - 1) / 2.0
    return (yy * yy + xx * xx <= r * r).astype(dtype)


class TrackerState(NamedTuple):
    xy: jnp.ndarray  # [M, 2] pixel positions
    ids: jnp.ndarray  # [M] int32 (-1 empty)
    track_cnt: jnp.ndarray  # [M]
    norm_prev: jnp.ndarray  # [M, 2] previous normalized coords (velocity)
    next_id: jnp.ndarray  # [] int32
    prev_img: jnp.ndarray  # [H, W]
    has_prev: jnp.ndarray  # [] bool


class TrackerOutput(NamedTuple):
    ids: jnp.ndarray  # [M]
    rays: jnp.ndarray  # [M, 3] normalized (z=1)
    velocity: jnp.ndarray  # [M, 2] d(norm)/dt
    xy: jnp.ndarray  # [M, 2] pixel
    valid: jnp.ndarray  # [M]
    track_cnt: jnp.ndarray  # [M]


def init_state(cfg: TrackerConfig, H, W, dtype=jnp.float32) -> TrackerState:
    M = cfg.max_features
    return TrackerState(
        xy=jnp.zeros((M, 2), dtype),
        ids=jnp.full((M,), -1, jnp.int32),
        track_cnt=jnp.zeros((M,), jnp.int32),
        norm_prev=jnp.zeros((M, 2), dtype),
        next_id=jnp.asarray(0, jnp.int32),
        prev_img=jnp.zeros((H, W), dtype),
        has_prev=jnp.asarray(False),
    )


def step(state: TrackerState, img, cam: cam_mod.CameraModel, cfg: TrackerConfig,
         dt, key, fisheye_mask=None):
    """Process one frame.  Returns (new_state, TrackerOutput).

    fisheye_mask: optional [H, W] 0/1 valid-image region (parameters.cpp
    FISHEYE mask, feature_tracker.cpp:40): tracked points leaving the region
    are dropped and detection is confined to it.
    """
    dtype = img.dtype
    M = cfg.max_features
    if cfg.equalize:
        img = clahe(img)

    # ---- track ------------------------------------------------------------
    valid0 = state.ids >= 0
    pts1, ok, _ = klt_mod.track(state.prev_img, img, state.xy, cfg.klt)
    ok = ok & valid0 & state.has_prev
    if fisheye_mask is not None:
        H_, W_ = img.shape
        xi = jnp.clip(jnp.round(pts1[:, 0]).astype(jnp.int32), 0, W_ - 1)
        yi = jnp.clip(jnp.round(pts1[:, 1]).astype(jnp.int32), 0, H_ - 1)
        ok = ok & (fisheye_mask[yi, xi] > 0)

    # ---- F-RANSAC outlier rejection (virtual focal plane) -----------------
    norm0 = cam_mod.lift(cam, state.xy)[:, 0:2]
    norm1 = cam_mod.lift(cam, pts1)[:, 0:2]
    n_ok = jnp.sum(ok.astype(jnp.int32))
    thr = cfg.f_threshold / 460.0

    def do_ransac(_):
        _, inl, _ = mvg.ransac_essential(
            norm0, norm1, ok, key, n_hyp=cfg.ransac_hyps, threshold=thr
        )
        return inl

    inl = jax.lax.cond(n_ok >= 12, do_ransac, lambda _: ok, None)
    ok = ok & inl

    # ---- survivor compaction + top-up detection ---------------------------
    xy_cur = jnp.where(ok[:, None], pts1, state.xy)
    new_xy, new_score, new_valid = corners_mod.detect(
        img, max_corners=M, min_dist=cfg.min_dist, quality=cfg.quality,
        existing_xy=xy_cur, existing_mask=ok, region_mask=fisheye_mask,
    )

    # fill free slots with new detections (rank matching, like track ingest)
    free = ~ok
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    new_rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    take = new_valid & (new_rank < n_free)
    # slot for new detection k: the free slot with free_rank == new_rank[k]
    assigned = (free_rank[None, :] == new_rank[:, None]) & free[None, :] & take[:, None]
    slot_has_new = jnp.any(assigned, axis=0)
    src = jnp.argmax(assigned, axis=0)

    xy_new = jnp.where(slot_has_new[:, None], new_xy[src], xy_cur)
    new_id_rank = jnp.cumsum(slot_has_new.astype(jnp.int32)) - 1
    ids_new = jnp.where(
        slot_has_new, state.next_id + new_id_rank, jnp.where(ok, state.ids, -1)
    )
    track_cnt_new = jnp.where(
        slot_has_new, 1, jnp.where(ok, state.track_cnt + 1, 0)
    )
    n_new = jnp.sum(slot_has_new.astype(jnp.int32))

    # ---- normalized coords + velocities (undistortedPoints:317) -----------
    norm_cur = cam_mod.lift(cam, xy_new)[:, 0:2]
    vel = jnp.where(
        (ok & ~slot_has_new)[:, None],
        (norm_cur - state.norm_prev) / jnp.maximum(dt, 1e-6),
        jnp.zeros_like(norm_cur),
    )
    valid_out = ids_new >= 0

    out = TrackerOutput(
        ids=jnp.where(valid_out, ids_new, -1),
        rays=jnp.concatenate([norm_cur, jnp.ones((M, 1), dtype)], axis=1),
        velocity=vel,
        xy=xy_new,
        valid=valid_out,
        track_cnt=track_cnt_new,
    )
    state_new = TrackerState(
        xy=xy_new,
        ids=ids_new,
        track_cnt=track_cnt_new,
        norm_prev=norm_cur,
        next_id=(state.next_id + n_new).astype(state.next_id.dtype),
        prev_img=img,
        has_prev=jnp.asarray(True),
    )
    return state_new, out


class FeatureTrackerFrontend:
    """Host wrapper: owns the jitted step and the RNG stream."""

    def __init__(self, cam: cam_mod.CameraModel, cfg: TrackerConfig = TrackerConfig(),
                 dtype=jnp.float32, seed=0, fisheye_mask=None):
        self.cam = cam
        self.cfg = cfg
        self.state = init_state(cfg, cam.height, cam.width, dtype)
        self.last_t = None
        self._key = jax.random.PRNGKey(seed)
        if fisheye_mask is None and cfg.fisheye:
            fisheye_mask = circular_fisheye_mask(
                cam.height, cam.width, dtype=dtype
            )
        self.fisheye_mask = (
            jnp.asarray(fisheye_mask, dtype) if fisheye_mask is not None else None
        )
        self._step = jax.jit(
            lambda st, img, dt, key: step(
                st, img, cam, cfg, dt, key, fisheye_mask=self.fisheye_mask
            )
        )

    def process(self, t, img):
        dt = 0.05 if self.last_t is None else max(t - self.last_t, 1e-3)
        self.last_t = t
        self._key, k = jax.random.split(self._key)
        self.state, out = self._step(self.state, img, jnp.asarray(dt, img.dtype), k)
        return out
