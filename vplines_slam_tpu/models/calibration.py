"""Online self-calibration: camera-IMU extrinsic rotation + time offset.

Parity with:
- ``vins_estimator/src/initial/initial_ex_rotation.cpp``
  (CalibrationExRotation): hand-eye q_cam ⊗ q_ic = q_ic ⊗ q_imu stacked
  quaternion least squares with an angular-error robust kernel, solved by
  SVD; convergence gate on the second-smallest singular value.
- ``vins_estimator/src/factor/time_factor.{h,cpp}`` (InitialEXTime:
  CalibrationExTime:20, calib_time:82): accumulate camera-yaw vs IMU-yaw
  curves, then point-to-line ICP between the (time, angle) point sets with
  the rotation frozen, solving only the time shift.  The reference uses
  nanoflann kNN + ceres autodiff; here the NN search is a batched argmin and
  the 1-dof solve is a fixed-iteration Gauss-Newton.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.geometry import quat_left, quat_mul, quat_right


def calibrate_extrinsic_rotation(q_cam_rel, q_imu_rel, valid):
    """Hand-eye rotation from K frame-pair rotation pairs.

    q_cam_rel: [K, 4] camera relative rotations (from 5-pt/essential),
    q_imu_rel: [K, 4] body relative rotations (preintegration delta_q).
    Returns (q_ic [4], converged flag, second-smallest singular value).
    """
    K = q_cam_rel.shape[0]
    dtype = q_cam_rel.dtype

    # robust angular weights (initial_ex_rotation.cpp:31-38): the residual
    # angle between predicted and measured rotation, huber at 5 degrees
    def weight(qc, qi):
        # without a current estimate, the reference uses the angle between
        # ric^-1 qc ric and qi; for the linear solve we weight by pair
        # rotation magnitude agreement
        ang_c = 2.0 * jnp.arccos(jnp.clip(jnp.abs(qc[0]), 0.0, 1.0))
        ang_i = 2.0 * jnp.arccos(jnp.clip(jnp.abs(qi[0]), 0.0, 1.0))
        d = jnp.abs(ang_c - ang_i)
        thr = jnp.asarray(jnp.deg2rad(5.0), dtype)
        return jnp.where(d < thr, 1.0, thr / jnp.maximum(d, 1e-9))

    def block(qc, qi, v):
        # q_imu ⊗ q_ic = q_ic ⊗ q_cam  =>  (L(q_imu) - R(q_cam)) q_ic = 0
        w = weight(qc, qi) * v
        return (quat_left(qi) - quat_right(qc)) * w

    A = jax.vmap(block)(q_cam_rel, q_imu_rel, valid.astype(dtype))  # [K,4,4]
    A = A.reshape(-1, 4)
    _, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    q = Vt[-1]
    q = q * jnp.where(q[0] < 0, -1.0, 1.0)
    # convergence gate (initial_ex_rotation.cpp:66): σ3 > 0.25
    converged = s[2] > 0.25
    return q / jnp.linalg.norm(q), converged, s[2]


def integrate_gyro_yaw(ts, gyrs, q0=None):
    """Integrated body yaw curve from raw gyro (CalibrationExTime's IMU-side
    accumulation).  Returns yaw [N] in radians."""
    from ..utils.geometry import quat_normalize, quat_to_rot, rot_to_ypr, delta_quat

    dtype = gyrs.dtype
    q_init = jnp.array([1.0, 0.0, 0.0, 0.0], dtype) if q0 is None else q0

    def step(q, inp):
        dt, w0, w1 = inp
        q2 = quat_normalize(quat_mul(q, delta_quat(0.5 * (w0 + w1) * dt)))
        return q2, q2

    dts = jnp.diff(ts)
    _, qs = jax.lax.scan(step, q_init, (dts, gyrs[:-1], gyrs[1:]))
    qs = jnp.concatenate([q_init[None], qs])
    yaws = jax.vmap(lambda q: rot_to_ypr(quat_to_rot(q))[0])(qs)
    return jnp.deg2rad(yaws)


def calibrate_time_offset(
    t_cam, yaw_cam, cam_valid, t_imu, yaw_imu, iters=10, td_init=0.0
):
    """Solve the camera-IMU time shift by point-to-line ICP between the two
    (time, yaw) curves (time_factor.cpp calib_time:82).

    t_cam/yaw_cam: [N] camera timestamps + accumulated visual yaw (rad);
    t_imu/yaw_imu: [M] dense IMU curve.  Returns (td, rms).
    The camera curve evaluated at t_cam + td must lie on the IMU curve.
    A constant yaw offset c is estimated jointly: the two cumulative curves
    have independent origins (and slow visual drift), which would otherwise
    leak into the time shift wherever the curve slope is shallow.
    """
    dtype = t_cam.dtype

    def residuals(x):
        td, c = x[0], x[1]
        tq = t_cam + td

        def one(t, y, v):
            # nearest IMU sample and its forward segment
            d = jnp.abs(t_imu - t)
            k = jnp.clip(jnp.argmin(d), 0, t_imu.shape[0] - 2)
            p0 = jnp.stack([t_imu[k], yaw_imu[k]])
            p1 = jnp.stack([t_imu[k + 1], yaw_imu[k + 1]])
            u = p1 - p0
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-9)
            p = jnp.stack([t, y + c])
            perp = (p - p0) - jnp.dot(p - p0, u) * u
            return jnp.linalg.norm(perp) * v

        return jax.vmap(one)(tq, yaw_cam, cam_valid.astype(dtype))

    def gn(x, _):
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)  # [N, 2]
        H = J.T @ J + 1e-9 * jnp.eye(2, dtype=dtype)
        g = J.T @ r
        return x - jnp.linalg.solve(H, g), None

    x0 = jnp.asarray([td_init, 0.0], dtype)
    x, _ = jax.lax.scan(gn, x0, None, length=iters)
    rms = jnp.sqrt(jnp.mean(residuals(x) ** 2))
    return x[0], rms
