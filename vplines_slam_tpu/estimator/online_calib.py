"""Online self-calibration wiring: extrinsic-rotation mode 2 + time offset.

The reference engages these from the estimator loop:
- ESTIMATE_EXTRINSIC==2 runs hand-eye during the INITIAL phase
  (vins_estimator/src/estimator.cpp:141-173 -> initial_ex_rotation.cpp:13-80)
  and refuses to initialize until the rotation converges.
- Online temporal calibration accumulates camera-vs-IMU rotation curves and
  ICPs them for the time shift (vins_estimator/src/factor/time_factor.cpp:
  20-159); the estimated td then shifts measurement alignment
  (estimator_node.cpp:120-161 uses img_t + td as the IMU batch boundary).

The math lives in models/calibration.py; this module provides the jitted
fixed-shape programs the VioEngine calls every frame: per-frame-pair camera
rotation (RANSAC essential on the newest window pair) and the padded
accumulator solves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.calibration import (
    calibrate_extrinsic_rotation,
    calibrate_time_offset,
)
from ..ops import mvg
from ..utils.geometry import quat_mul, rot_to_quat


def pair_rotation(obs_i, obs_j, mask_i, mask_j, ids, key, min_corres=12):
    """Relative camera rotation between two window frames from tracked
    correspondences (solve_5pts solveRelativeRT parity, 8-pt essential +
    RANSAC + cheirality).  Returns (q_rel c_i->c_j, ok)."""
    corr = mask_i & mask_j & (ids >= 0)
    E, inliers, n_inl = mvg.ransac_essential(
        obs_i[:, 0:2], obs_j[:, 0:2], corr, key
    )
    R, t, votes = mvg.decompose_essential(
        E, obs_i[:, 0:2], obs_j[:, 0:2], inliers
    )
    # decompose gives R_{cj<-ci} (x_j ~ R x_i + t); hand-eye wants q_cam_rel
    # = rotation of frame j expressed in frame i = R_{ci<-cj} = Rᵀ, matching
    # the IMU preintegration delta_q convention (q_bi_bj)
    q = rot_to_quat(R.T)
    ok = (n_inl >= min_corres) & (votes >= n_inl // 2)
    return q, ok


class ExtrinsicCalib(NamedTuple):
    """Fixed-capacity accumulator for hand-eye rotation pairs."""

    q_cam: jnp.ndarray  # [K, 4]
    q_imu: jnp.ndarray  # [K, 4]
    valid: jnp.ndarray  # [K]
    count: jnp.ndarray  # [] int32


def empty_extrinsic_calib(capacity=64, dtype=jnp.float64) -> ExtrinsicCalib:
    q0 = jnp.zeros((capacity, 4), dtype).at[:, 0].set(1.0)
    return ExtrinsicCalib(
        q_cam=q0, q_imu=q0, valid=jnp.zeros(capacity, bool),
        count=jnp.asarray(0, jnp.int32),
    )


def push_rotation_pair(acc: ExtrinsicCalib, q_cam, q_imu, ok) -> ExtrinsicCalib:
    """Append one (camera, IMU) relative-rotation pair (ring once full)."""
    K = acc.valid.shape[0]
    k = acc.count % K
    return ExtrinsicCalib(
        q_cam=acc.q_cam.at[k].set(jnp.where(ok, q_cam, acc.q_cam[k])),
        q_imu=acc.q_imu.at[k].set(jnp.where(ok, q_imu, acc.q_imu[k])),
        valid=acc.valid.at[k].set(acc.valid[k] | ok),
        count=acc.count + ok.astype(jnp.int32),
    )


def solve_extrinsic(acc: ExtrinsicCalib, min_pairs=12):
    """Hand-eye solve over the accumulated pairs (CalibrationExRotation)."""
    q_ic, converged, sigma = calibrate_extrinsic_rotation(
        acc.q_cam, acc.q_imu, acc.valid
    )
    converged = converged & (acc.count >= min_pairs)
    return q_ic, converged, sigma


class TimeOffsetCalib(NamedTuple):
    """Fixed-capacity (time, unwrapped yaw) curves for the camera (frame
    rate) and IMU (sample rate) — SIGNED yaw like the reference's
    CalibrationExTime (time_factor.cpp); unsigned rotation magnitudes would
    accumulate a positive noise bias on the visual curve and skew the ICP."""

    t_cam: jnp.ndarray  # [C]
    ang_cam: jnp.ndarray  # [C] unwrapped visual body-yaw (rad)
    cam_valid: jnp.ndarray  # [C]
    n_cam: jnp.ndarray  # [] int32
    q_cam_cum: jnp.ndarray  # [4] accumulated visual body rotation
    t_imu: jnp.ndarray  # [M]
    ang_imu: jnp.ndarray  # [M] unwrapped gyro-integrated yaw (rad)
    n_imu: jnp.ndarray  # [] int32
    q_imu_cum: jnp.ndarray  # [4] accumulated gyro rotation


def empty_td_calib(cam_capacity=128, imu_capacity=4096, dtype=jnp.float64):
    qid = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    return TimeOffsetCalib(
        t_cam=jnp.zeros(cam_capacity, dtype),
        ang_cam=jnp.zeros(cam_capacity, dtype),
        cam_valid=jnp.zeros(cam_capacity, bool),
        n_cam=jnp.asarray(0, jnp.int32),
        q_cam_cum=qid,
        t_imu=jnp.zeros(imu_capacity, dtype),
        ang_imu=jnp.zeros(imu_capacity, dtype),
        n_imu=jnp.asarray(0, jnp.int32),
        q_imu_cum=qid,
    )


def _yaw(q):
    from ..utils.geometry import quat_to_rot, rot_to_ypr

    return jnp.deg2rad(rot_to_ypr(quat_to_rot(q))[0])


def _wrap(a):
    return (a + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def push_cam_angle(
    acc: TimeOffsetCalib, t, dq_cam, q_ic, ok, dq_imu_fallback
) -> TimeOffsetCalib:
    """Append the camera curve sample at frame time t: the frame-pair camera
    rotation conjugated into the body frame (dq_b = q_ic ⊗ dq ⊗ q_ic⁻¹, as
    CalibrationExTime does with ric), composed and unwrapped to a yaw curve.

    dq_imu_fallback: the interval's preintegrated body rotation — substituted
    when the visual pair failed, so a dropped pair does not permanently
    desync the two cumulative curves (the sample is still marked invalid and
    contributes no ICP residual)."""
    from ..utils.geometry import quat_conj, quat_normalize

    C = acc.t_cam.shape[0]
    k = jnp.minimum(acc.n_cam, C - 1)
    dq_b = quat_mul(quat_mul(q_ic, dq_cam), quat_conj(q_ic))
    dq_b = jnp.where(ok, dq_b, dq_imu_fallback)
    q_new = quat_normalize(quat_mul(acc.q_cam_cum, dq_b))
    prev = jnp.where(acc.n_cam > 0, acc.ang_cam[jnp.maximum(k - 1, 0)], 0.0)
    dyaw = _wrap(_yaw(q_new) - _yaw(acc.q_cam_cum))
    new_ang = prev + dyaw
    return acc._replace(
        t_cam=acc.t_cam.at[k].set(t),
        ang_cam=acc.ang_cam.at[k].set(new_ang),
        cam_valid=acc.cam_valid.at[k].set(ok),
        n_cam=jnp.minimum(acc.n_cam + 1, C),
        q_cam_cum=q_new,
    )


def push_imu_angles(acc: TimeOffsetCalib, ts, gyrs, mask) -> TimeOffsetCalib:
    """Append a batch of IMU curve samples: gyro quaternion integration,
    unwrapped yaw per sample.  ts [I+1], gyrs [I+1, 3], mask [I]."""
    from ..utils.geometry import delta_quat, quat_normalize

    M = acc.t_imu.shape[0]
    dts = jnp.diff(ts) * mask

    def step(q, inp):
        dt, w0, w1 = inp
        q2 = quat_normalize(quat_mul(q, delta_quat(0.5 * (w0 + w1) * dt)))
        return q2, _yaw(q2)

    q_final, yaws = jax.lax.scan(
        step, acc.q_imu_cum, (dts, gyrs[:-1], gyrs[1:])
    )
    # unwrap against the running curve
    prev_ang = jnp.where(
        acc.n_imu > 0, acc.ang_imu[jnp.maximum(acc.n_imu - 1, 0)], 0.0
    )
    prev_yaw = _yaw(acc.q_imu_cum)
    all_yaws = jnp.concatenate([prev_yaw[None], yaws])
    dyaws = _wrap(jnp.diff(all_yaws)) * mask
    cum = prev_ang + jnp.cumsum(dyaws)
    idx = jnp.minimum(acc.n_imu + jnp.arange(dts.shape[0]), M - 1)
    write = mask & (acc.n_imu + jnp.arange(dts.shape[0]) < M)
    t_new = acc.t_imu.at[idx].set(jnp.where(write, ts[1:], acc.t_imu[idx]))
    a_new = acc.ang_imu.at[idx].set(jnp.where(write, cum, acc.ang_imu[idx]))
    return acc._replace(
        t_imu=t_new, ang_imu=a_new,
        n_imu=jnp.minimum(acc.n_imu + jnp.sum(mask.astype(jnp.int32)), M),
        q_imu_cum=q_final,
    )


def solve_time_offset(acc: TimeOffsetCalib, td_init=0.0, min_cam=30):
    """ICP the camera curve onto the IMU curve for the time shift
    (time_factor.cpp calib_time:82).  Returns (td, rms, ok)."""
    idx = jnp.arange(acc.t_cam.shape[0])
    cam_ok = acc.cam_valid & (idx < acc.n_cam)
    # restrict the IMU curve to its filled prefix by clamping the NN search:
    # unfilled entries are zero -> mask them out by pushing them far away
    m_idx = jnp.arange(acc.t_imu.shape[0])
    filled = m_idx < acc.n_imu
    t_imu = jnp.where(filled, acc.t_imu, 1e9 + m_idx.astype(acc.t_imu.dtype))
    # continue the curve flat past its end so a boundary-nearest match sees a
    # benign horizontal segment instead of garbage
    ang_last = acc.ang_imu[jnp.maximum(acc.n_imu - 1, 0)]
    ang_imu = jnp.where(filled, acc.ang_imu, ang_last)
    td, rms = calibrate_time_offset(
        acc.t_cam, acc.ang_cam, cam_ok, t_imu, ang_imu, td_init=td_init
    )
    ok = (acc.n_cam >= min_cam) & jnp.isfinite(td)
    return td, rms, ok
