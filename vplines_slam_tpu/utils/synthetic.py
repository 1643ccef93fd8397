"""Synthetic visual-inertial world generator for tests and benchmarks.

The reference validates against EuRoC bags (not available offline), so this
module provides the ground-truth harness the test pyramid runs on: analytic
trajectories whose IMU measurements come from autodiff (exact accelerations
and body rates), plus random 3D point and line landmarks observed through
any camera model.  Mirrors the role of the reference's
``benchmark_publisher`` GT harness + mh04 fixtures.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import (
    pose_inverse,
    quat_conj,
    quat_mul,
    quat_rotate,
    quat_to_rot,
    rot_to_quat,
    ypr_to_rot,
)

GRAVITY = 9.81007  # euroc_config.yaml g_norm


class Trajectory(NamedTuple):
    """Analytic body->world trajectory: position and orientation vs time [s]."""

    pos: Callable  # t -> [3]
    quat: Callable  # t -> [4] wxyz


def figure8_trajectory(
    radius=2.0,
    height_amp=0.4,
    omega=0.6283,  # one loop per 10 s
    ypr_amp=(25.0, 8.0, 6.0),
    dtype=jnp.float64,
):
    """A smooth excited trajectory (figure-8 + oscillating attitude).

    Rich in both rotation and acceleration so visual-inertial alignment is
    observable (scale/gravity/bias all excited).
    """

    def pos(t):
        t = jnp.asarray(t, dtype)
        x = radius * jnp.sin(omega * t)
        y = radius * jnp.sin(omega * t) * jnp.cos(omega * t)
        z = height_amp * jnp.sin(1.7 * omega * t)
        return jnp.stack([x, y, z])

    def quat(t):
        t = jnp.asarray(t, dtype)
        ypr = jnp.stack(
            [
                ypr_amp[0] * jnp.sin(0.9 * omega * t),
                ypr_amp[1] * jnp.sin(1.3 * omega * t + 0.4),
                ypr_amp[2] * jnp.sin(1.1 * omega * t + 1.1),
            ]
        )
        return rot_to_quat(ypr_to_rot(ypr))

    return Trajectory(pos=pos, quat=quat)


def body_rates(traj: Trajectory, t):
    """Exact body angular velocity ω_b with [ω]× = Rᵀ R' via autodiff."""
    R = quat_to_rot(traj.quat(t))
    dR = jax.jacfwd(lambda s: quat_to_rot(traj.quat(s)))(t)
    W = R.T @ dR
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def world_accel(traj: Trajectory, t):
    """Exact world-frame acceleration p''(t) via autodiff."""
    return jax.jacfwd(jax.jacfwd(traj.pos))(t)


def world_velocity(traj: Trajectory, t):
    return jax.jacfwd(traj.pos)(t)


def imu_samples(
    traj: Trajectory,
    times,
    *,
    acc_noise=0.0,
    gyr_noise=0.0,
    acc_bias=None,
    gyr_bias=None,
    seed=0,
    g_norm=GRAVITY,
):
    """Simulate IMU output at the given times.

    accelerometer measures specific force  a_m = R_wbᵀ (a_w + G) + b_a + n,
    G = [0,0,g_norm] — the sign convention the preintegration residual
    expects (integration_base.h evaluate:224 uses +0.5·G·dt²).
    """
    times = jnp.asarray(times)
    dtype = times.dtype
    G = jnp.array([0.0, 0.0, g_norm], dtype)

    def one(t):
        q = traj.quat(t)
        a_w = world_accel(traj, t)
        acc = quat_rotate(quat_conj(q), a_w + G)
        gyr = body_rates(traj, t)
        return acc, gyr

    accs, gyrs = jax.vmap(one)(times)
    rng = np.random.default_rng(seed)
    if acc_noise:
        accs = accs + jnp.asarray(rng.standard_normal(accs.shape), dtype) * acc_noise
    if gyr_noise:
        gyrs = gyrs + jnp.asarray(rng.standard_normal(gyrs.shape), dtype) * gyr_noise
    if acc_bias is not None:
        accs = accs + jnp.asarray(acc_bias, dtype)
    if gyr_bias is not None:
        gyrs = gyrs + jnp.asarray(gyr_bias, dtype)
    return accs, gyrs


def ground_truth_states(traj: Trajectory, times):
    """(p, q, v) at each time — for ATE evaluation and alignment tests."""
    times = jnp.asarray(times)
    ps = jax.vmap(traj.pos)(times)
    qs = jax.vmap(traj.quat)(times)
    vs = jax.vmap(lambda t: world_velocity(traj, t))(times)
    return ps, qs, vs


def scatter_landmarks(n, seed=0, box=((-6.0, 6.0), (-6.0, 6.0), (-1.5, 3.5)), dtype=np.float64):
    """Random 3D points in a box around the trajectory."""
    rng = np.random.default_rng(seed)
    lo = np.array([b[0] for b in box])
    hi = np.array([b[1] for b in box])
    return jnp.asarray(rng.uniform(lo, hi, size=(n, 3)).astype(dtype))


def scatter_lines(n, seed=1, length=(0.5, 2.5), dtype=np.float64):
    """Random 3D segments (endpoints [n,2,3]); a structural fraction is axis-
    aligned (Manhattan world) so vanishing-point tests have signal."""
    rng = np.random.default_rng(seed)
    mid = rng.uniform([-5, -5, -1], [5, 5, 3], size=(n, 3))
    axis_dirs = np.eye(3)
    dirs = np.empty((n, 3))
    for i in range(n):
        if i % 4 < 3:  # 75% structural lines along x/y/z
            dirs[i] = axis_dirs[i % 3]
        else:
            d = rng.standard_normal(3)
            dirs[i] = d / np.linalg.norm(d)
    half = rng.uniform(*length, size=(n, 1)) * 0.5
    a = mid - dirs * half
    b = mid + dirs * half
    return jnp.asarray(np.stack([a, b], axis=1).astype(dtype))


def observe_points(
    cam_project,
    landmarks,
    q_wb,
    p_wb,
    q_bc,
    p_bc,
    *,
    pix_noise=0.0,
    seed=0,
    min_depth=0.1,
):
    """Project world landmarks through body pose + camera extrinsic.

    Returns (uv [N,2], depth [N], valid [N]).  cam_project is
    ``lambda X_c: (uv, valid)`` (models.camera.project partial).
    """
    q_cw, p_cw = pose_inverse(*_compose(q_wb, p_wb, q_bc, p_bc))
    X_c = jax.vmap(lambda X: quat_rotate(q_cw, X) + p_cw)(landmarks)
    uv, valid = cam_project(X_c)
    depth = X_c[..., 2]
    valid = valid & (depth > min_depth)
    if pix_noise:
        rng = np.random.default_rng(seed)
        uv = uv + jnp.asarray(rng.standard_normal(uv.shape), uv.dtype) * pix_noise
    return uv, depth, valid


def _compose(q1, p1, q2, p2):
    return quat_mul(q1, q2), quat_rotate(q1, p2) + p1


def loop_trajectory(
    radius=3.0,
    omega=2.0 * np.pi / 30.0,  # one lap per 30 s: ~0.63 m/s, EuRoC-like
    # flow (~10 px rotation + ~10 px parallax per 10 Hz frame at 3 m depth
    # — faster laps exceed the KLT pyramid range and starve the tracker)
    height_amp=0.25,
    wobble_deg=(6.0, 4.0),
    speed_mod=0.12,
    radius_mod=0.05,
    dtype=jnp.float64,
):
    """A closed circular survey lap with tangent-following yaw, EXACTLY
    periodic with period 2π/ω: every attitude/height frequency is an integer
    multiple of the lap frequency, so lap k revisits lap 0's poses exactly —
    the revisit geometry loop-closure e2e runs need (the figure-8's
    incommensurate attitude terms leave up to ~30° yaw mismatch at
    revisits, right at the pose-graph gate).

    speed_mod/radius_mod (phase and radius harmonics, also lap-periodic) are
    NOT cosmetic: at constant angular rate the centripetal acceleration is a
    near-constant body-frame vector — exactly the accelerometer-bias
    direction — so monocular scale is UNOBSERVABLE on a clean circle and the
    estimator free-walks scale into the bias (measured: |p| grew 1.8→12 m
    over 0.8 laps of the r=3 circuit once far wall features dominated).
    Time-varying tangential/radial acceleration (3ω and 2ω harmonics, ~0.14
    m/s² amplitude) cannot be absorbed by a per-window-constant bias, which
    restores scale observability while keeping revisits exact.
    """

    def pos(t):
        t = jnp.asarray(t, dtype)
        ph = omega * t + speed_mod * jnp.sin(3.0 * omega * t)
        r = radius * (1.0 + radius_mod * jnp.sin(2.0 * omega * t + 0.7))
        x = r * jnp.cos(ph)
        y = r * jnp.sin(ph)
        z = height_amp * jnp.sin(2.0 * omega * t)
        return jnp.stack([x, y, z])

    def quat(t):
        t = jnp.asarray(t, dtype)
        # camera (body x) looks INWARD at the surveyed interior: translation
        # stays parallel to the image plane, so features persist across the
        # whole init window instead of streaming out of a forward-looking
        # FOE (measured: tangent-looking retention ~0.65/step -> ~1 frame-0
        # correspondence left after 10 steps; inward-looking survives)
        # follow the MODULATED phase so the camera keeps facing the interior
        yaw = (
            jnp.degrees(omega * t + speed_mod * jnp.sin(3.0 * omega * t))
            + 180.0 + 5.0 * jnp.sin(3.0 * omega * t + 1.3)
        )
        pitch = wobble_deg[0] * jnp.sin(2.0 * omega * t + 0.4)
        roll = wobble_deg[1] * jnp.sin(4.0 * omega * t + 1.1)
        return rot_to_quat(ypr_to_rot(jnp.stack([yaw, pitch, roll])))

    return Trajectory(pos=pos, quat=quat)
