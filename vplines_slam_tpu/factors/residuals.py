"""Residual primitives for the sliding-window visual-inertial bundle adjustment.

Single-factor pure functions, written to be ``vmap``-ed over the whole
fixed-shape factor population and differentiated with ``jax.jacfwd`` — the
TPU-native replacement for the reference's hand-derived ceres
``SizedCostFunction`` jacobians:

- point: unit-sphere tangent-plane reprojection
  (``vins_estimator/src/factor/projection_factor.cpp:26-225`` with
  ``UNIT_SPHERE_ERROR``, parameters.h:27)
- line: endpoint-to-projected-infinite-line distance on the normalized plane
  (``line_projection_factor.cpp:242-380``)
- vanishing point: projected line direction vs observed VP
  (``line_projection_factor.cpp:11-237``)

Weights follow estimator.cpp:18-20: point √info = FOCAL/1.5, VP = 10.0
(euroc config).  The LINE weight deliberately deviates from the reference's
306.67 (== the point weight): a line residual is the perpendicular distance
of a DETECTOR-FITTED segment endpoint to the projected line, and an OLS
line fit over n ≈ L_px edge pixels has perpendicular endpoint noise
≈ 2σ_px/√L_px — 3.5-7x below the single-pixel noise a point observation
carries (L_px 50-200).  Weighting lines at the point weight under-counts
their information ~25x; √info 1500 ≈ 5x the point weight is the
fit-statistics-consistent value.  Measured (4-seed figure-8, docs/
ACCURACY.md): at 306.67 the line channel is ATE-neutral-to-worse; at the
consistent weight points+lines+VP beat points-only 0.33 -> 0.22 m at 1 px
and reach parity at 0.5 px.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.geometry import quat_conj, quat_rotate
from ..utils.plucker import orth_to_plk, plk_transform

FOCAL_LENGTH = 460.0
POINT_SQRT_INFO = FOCAL_LENGTH / 1.5
LINE_SQRT_INFO = 1500.0  # fit-statistics weight; reference parity = 306.67
VP_SQRT_INFO = 10.0


def tangent_basis(ray):
    """Orthonormal basis (b1, b2) of the plane ⊥ ray (projection_factor.cpp:16-24)."""
    a = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    tmp = jnp.where(
        (jnp.abs(a[..., 2:3]) < 0.9),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], a.dtype), a.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], a.dtype), a.shape),
    )
    b1 = tmp - a * jnp.sum(a * tmp, axis=-1, keepdims=True)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(a, b1)
    return b1, b2


def point_reprojection(
    p_i, q_i, p_j, q_j, p_ic, q_ic, inv_depth, obs_i, obs_j
):
    """Unit-sphere reprojection residual of one track between frames i and j.

    obs_i/obs_j: normalized-plane unit rays (or [x,y,1] homogeneous) of the
    feature in camera i / j.  Returns a 2-vector (unwhitened).
    """
    pts_i = obs_i / obs_i[..., 2:3]  # anchor parameterization uses z=1 ray
    pts_cam_i = pts_i / inv_depth
    pts_imu_i = quat_rotate(q_ic, pts_cam_i) + p_ic
    pts_w = quat_rotate(q_i, pts_imu_i) + p_i
    pts_imu_j = quat_rotate(quat_conj(q_j), pts_w - p_j)
    pts_cam_j = quat_rotate(quat_conj(q_ic), pts_imu_j - p_ic)

    b1, b2 = tangent_basis(obs_j)
    d = pts_cam_j / jnp.linalg.norm(pts_cam_j, axis=-1, keepdims=True)
    e = d - obs_j / jnp.linalg.norm(obs_j, axis=-1, keepdims=True)
    return jnp.stack([jnp.sum(b1 * e, -1), jnp.sum(b2 * e, -1)], axis=-1)


def line_reprojection(p_i, q_i, p_ic, q_ic, orth_w, obs):
    """Point-to-line distances of the two observed endpoints to the projected
    infinite line (line_projection_factor.cpp:270-281).

    obs: [4] = (u1, v1, u2, v2) segment endpoints on the normalized plane.
    """
    plk_w = orth_to_plk(orth_w)
    # world -> body -> camera (R_bw = R(q_i)^T)
    from ..utils.geometry import quat_to_rot

    R_bw = quat_to_rot(q_i).mT if q_i.ndim > 1 else quat_to_rot(q_i).T
    t_bw = -quat_rotate(quat_conj(q_i), p_i)
    plk_b = plk_transform(plk_w, R_bw, t_bw)
    R_cb = quat_to_rot(q_ic).mT if q_ic.ndim > 1 else quat_to_rot(q_ic).T
    t_cb = -quat_rotate(quat_conj(q_ic), p_ic)
    plk_c = plk_transform(plk_b, R_cb, t_cb)

    nc = plk_c[..., 0:3]
    # guarded: padded/degenerate slots give nc ~ 0; the caller masks the
    # residual, but the division must not manufacture NaNs (NaN·0 = NaN)
    denom = jnp.sqrt(jnp.maximum(nc[..., 0] ** 2 + nc[..., 1] ** 2, 1e-18))
    e1 = obs[..., 0] * nc[..., 0] + obs[..., 1] * nc[..., 1] + nc[..., 2]
    e2 = obs[..., 2] * nc[..., 0] + obs[..., 3] * nc[..., 1] + nc[..., 2]
    return jnp.stack([e1 / denom, e2 / denom], axis=-1)


def _point_to_line_residual(plk_c, obs):
    """Shared tail: endpoint distances to the projected infinite line."""
    nc = plk_c[..., 0:3]
    denom = jnp.sqrt(jnp.maximum(nc[..., 0] ** 2 + nc[..., 1] ** 2, 1e-18))
    e1 = obs[..., 0] * nc[..., 0] + obs[..., 1] * nc[..., 1] + nc[..., 2]
    e2 = obs[..., 2] * nc[..., 0] + obs[..., 3] * nc[..., 1] + nc[..., 2]
    return jnp.stack([e1 / denom, e2 / denom], axis=-1)


def line_reprojection_incamera(p_i, q_i, p_j, q_j, p_ic, q_ic, orth_ci, obs_j):
    """Line parameterized in its ANCHOR camera frame i, observed in frame j
    (lineProjectionFactor_incamera, line_projection_factor.h:40-50:
    SizedCostFunction<2,7,7,7,4> over pose_i, pose_j, extrinsic, line).

    orth_ci: 4-dof orthonormal coords of the line in camera i.
    obs_j: [4] segment endpoints on frame j's normalized plane.
    """
    from ..utils.geometry import quat_to_rot

    plk_ci = orth_to_plk(orth_ci)
    # camera_i -> world: T_w_ci = T_w_bi ∘ T_b_c
    R_ic = quat_to_rot(q_ic)
    R_wbi = quat_to_rot(q_i)
    R_wci = R_wbi @ R_ic
    t_wci = p_i + quat_rotate(q_i, p_ic)
    plk_w = plk_transform(plk_ci, R_wci, t_wci)
    # world -> camera_j (same chain as line_reprojection)
    R_bw = quat_to_rot(q_j).T
    t_bw = -quat_rotate(quat_conj(q_j), p_j)
    plk_b = plk_transform(plk_w, R_bw, t_bw)
    R_cb = R_ic.T
    t_cb = -quat_rotate(quat_conj(q_ic), p_ic)
    plk_cj = plk_transform(plk_b, R_cb, t_cb)
    return _point_to_line_residual(plk_cj, obs_j)


def line_reprojection_instartframe(orth_ci, obs_i):
    """Line in its anchor camera frame observed in that SAME frame
    (lineProjectionFactor_instartframe, line_projection_factor.h:52:
    SizedCostFunction<2,4> — no pose blocks; anchors the 4-dof line to its
    own first observation)."""
    plk_ci = orth_to_plk(orth_ci)
    return _point_to_line_residual(plk_ci, obs_i)


def vp_alignment(p_i, q_i, p_ic, q_ic, orth_w, vp_obs):
    """Vanishing-point residual: projected 3D line direction (in camera) vs the
    observed VP direction on the image plane (line_projection_factor.cpp:30-46).

    vp_obs: [3] homogeneous VP on the normalized plane.
    """
    plk_w = orth_to_plk(orth_w)
    from ..utils.geometry import quat_to_rot

    R_bw = quat_to_rot(q_i).mT if q_i.ndim > 1 else quat_to_rot(q_i).T
    t_bw = -quat_rotate(quat_conj(q_i), p_i)
    plk_b = plk_transform(plk_w, R_bw, t_bw)
    R_cb = quat_to_rot(q_ic).mT if q_ic.ndim > 1 else quat_to_rot(q_ic).T
    t_cb = -quat_rotate(quat_conj(q_ic), p_ic)
    plk_c = plk_transform(plk_b, R_cb, t_cb)

    d_c = plk_c[..., 3:6]
    dz = jnp.where(jnp.abs(d_c[..., 2]) < 1e-9, 1e-9, d_c[..., 2])
    vz = jnp.where(jnp.abs(vp_obs[..., 2]) < 1e-9, 1e-9, vp_obs[..., 2])
    return jnp.stack(
        [
            d_c[..., 0] / dz - vp_obs[..., 0] / vz,
            d_c[..., 1] / dz - vp_obs[..., 1] / vz,
        ],
        axis=-1,
    )


def huber_weight(r_sq, delta):
    """sqrt of the ceres-style Huber IRLS weight: residual and jacobian are
    scaled by sqrt(ρ'(s)) (first-order corrector)."""
    delta_sq = delta * delta
    w = jnp.where(r_sq <= delta_sq, jnp.ones_like(r_sq), delta / jnp.sqrt(jnp.maximum(r_sq, 1e-30)))
    return jnp.sqrt(w)


def cauchy_weight(r_sq, scale):
    """sqrt ρ'(s) for the Cauchy loss ρ(s)=c²·log(1+s/c²) (used by the
    line-only optimisation, estimator.cpp onlyLineOpt:958)."""
    c_sq = scale * scale
    return jnp.sqrt(1.0 / (1.0 + r_sq / c_sq))
