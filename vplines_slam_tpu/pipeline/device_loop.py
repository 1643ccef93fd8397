"""Device-resident frame pipeline: N frames of front-end + VIO in ONE jitted
lax.scan — the TPU-first throughput mode.

The host-orchestrated SlamSystem pays one host<->device round trip per frame
(acceptable co-located, ruinous over a remote-TPU link and still the latency
floor for batch/offline processing).  Here the ENTIRE steady-state loop —
point front-end (CLAHE-free KLT + detect), optional line front-end (EDLine +
anchor-KLT match + VP detection) and the sliding-window VIO step (IMU
preintegration, triangulation, window BA, marginalization, slide) — runs as
one compiled program over pre-staged frame/IMU tensors, emitting per-frame
poses and keyframe flags in a single device->host transfer.

This is the batch analogue of the reference's rosbag pipeline (6 ROS nodes,
SURVEY §1) collapsed into one XLA computation.  Loop closure stays on the
host: run it AFTER the scan on the emitted keyframes (poses + frames are all
available), or chunk the scan and interleave.

Typical use (see bench.py bench_device_loop):
  loop = make_device_loop(cam, tracker_cfg, window_cfg, params)
  carry = loop.init_carry(fe_state, vio_state, vio_data)
  carry, outs = loop.run(carry, imgs [T,H,W], imu batches, dts, keys)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..estimator import vio as vio_mod
from ..models import camera as cam_mod
from ..models import feature_tracker as ft_mod
from ..models import imu as imu_mod
from ..models import line_tracker as lt_mod
from ..ops.image import build_remap_plan, remap_static


class DeviceLoop(NamedTuple):
    run: object  # jitted (carry, imgs, imu, dts, keys) -> (carry, outs)
    init_carry: object


def make_device_loop(
    cam: cam_mod.CameraModel,
    tracker_cfg: ft_mod.TrackerConfig,
    window_cfg,
    params: imu_mod.ImuParams,
    line_cfg: Optional[lt_mod.LineTrackerConfig] = None,
    map_xy=None,
):
    """Build the jitted multi-frame loop.  The VIO must already be
    initialized (run the host engine through init first, then hand its
    state/data over).

    map_xy: undistort-rectify map for the line front-end (required when
    line_cfg is given).
    """
    use_lines = line_cfg is not None
    ideal = (
        cam_mod.pinhole(cam.fx, cam.fy, cam.cx, cam.cy,
                        width=cam.width, height=cam.height)
        if use_lines else None
    )
    remap_plan = build_remap_plan(map_xy) if use_lines else None

    def frame_step(carry, inp):
        img, imu_batch, dt, key = inp
        if use_lines:
            fe_state, ln_state, state, data = carry
            k1, k2 = jax.random.split(key)
        else:
            fe_state, state, data = carry
            k1 = key
        fe_state, feats = ft_mod.step(fe_state, img, cam, tracker_cfg, dt, k1)
        ln_args = ()
        if use_lines:
            img_u = remap_static(img, remap_plan)
            ln_state, lout = lt_mod.step(ln_state, img_u, ideal, line_cfg, k2)
            ln_args = (lout.ids, lout.endpoints, lout.vp_dirs, lout.vp_valid)
        state, data, out = vio_mod.track_step(
            state, data, feats.ids, feats.rays, ln_args, imu_batch,
            window_cfg, params, use_lines,
        )
        carry = (
            (fe_state, ln_state, state, data) if use_lines
            else (fe_state, state, data)
        )
        emit = (out.p, out.q, out.v, out.is_keyframe, out.failure, out.ba_cost)
        return carry, emit

    @jax.jit
    def run(carry, imgs, imu_batches, dts, keys):
        """imgs [T,H,W]; imu_batches: tuple of [T,...] arrays as produced by
        VioEngine._pack_imu per frame (stacked); dts [T]; keys [T,2]."""
        return jax.lax.scan(frame_step, carry, (imgs, imu_batches, dts, keys))

    def init_carry(fe_state, vio_state, vio_data, ln_state=None):
        if use_lines:
            return (fe_state, ln_state, vio_state, vio_data)
        return (fe_state, vio_state, vio_data)

    return DeviceLoop(run=run, init_carry=init_carry)
