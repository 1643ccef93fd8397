"""Intrinsic camera calibration: Zhang homography init + joint LM refinement.

Compact counterpart of the reference's calibration stack
(``camera_model/src/calib/CameraCalibration.cc`` + ceres
``CostFunctionFactory.cc`` + ``intrinsic_calib.cc`` CLI): given planar-board
correspondences per view, estimate pinhole intrinsics + rad-tan distortion
and per-view extrinsics.  The nonlinear refinement reuses the shared LM
engine (one batched reprojection residual stack instead of a ceres problem).
Board corner DETECTION (chessboard.cc) is a front-end concern planned for a
later round; this module consumes correspondences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..solver import lm as lm_mod
from ..utils.geometry import rot_to_quat, so3_exp_matrix, quat_to_rot, quat_log


def homography_dlt(obj_xy, img_xy, mask):
    """Planar homography via normalized DLT.  obj_xy [N,2] board coords,
    img_xy [N,2] pixels."""
    m = mask.astype(obj_xy.dtype)

    def norm(pts):
        c = jnp.sum(pts * m[:, None], axis=0) / jnp.sum(m)
        d = jnp.sqrt(jnp.sum((pts - c) ** 2, axis=1))
        s = jnp.sqrt(2.0) / (jnp.sum(d * m) / jnp.sum(m))
        T = jnp.array(
            [[s, 0.0, -s * c[0]], [0.0, s, -s * c[1]], [0.0, 0.0, 1.0]],
            obj_xy.dtype,
        )
        return (pts - c) * s, T

    op, To = norm(obj_xy)
    ip, Ti = norm(img_xy)

    def rows(o, i, w):
        x, y = o
        u, v = i
        z = jnp.zeros((), obj_xy.dtype)
        one = jnp.ones((), obj_xy.dtype)
        r1 = jnp.stack([-x, -y, -one, z, z, z, u * x, u * y, u]) * w
        r2 = jnp.stack([z, z, z, -x, -y, -one, v * x, v * y, v]) * w
        return jnp.stack([r1, r2])

    A = jax.vmap(rows)(op, ip, m).reshape(-1, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    Hn = Vt[-1].reshape(3, 3)
    H = jnp.linalg.solve(Ti, Hn @ To)
    return H / H[2, 2]


def zhang_intrinsics(Hs):
    """Closed-form K from ≥3 homographies (Zhang 2000)."""
    def v_ij(H, i, j):
        return jnp.stack(
            [
                H[0, i] * H[0, j],
                H[0, i] * H[1, j] + H[1, i] * H[0, j],
                H[1, i] * H[1, j],
                H[2, i] * H[0, j] + H[0, i] * H[2, j],
                H[2, i] * H[1, j] + H[1, i] * H[2, j],
                H[2, i] * H[2, j],
            ]
        )

    rows = []
    for H in Hs:
        rows.append(v_ij(H, 0, 1))
        rows.append(v_ij(H, 0, 0) - v_ij(H, 1, 1))
    V = jnp.stack(rows)
    _, _, Vt = jnp.linalg.svd(V, full_matrices=False)
    b = Vt[-1]
    B11, B12, B22, B13, B23, B33 = b
    cy = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + cy * (B12 * B13 - B11 * B23)) / B11
    fx = jnp.sqrt(jnp.abs(lam / B11))
    fy = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    cx = -B13 * fx * fx / lam
    return fx, fy, cx, cy


def pose_from_homography(H, fx, fy, cx, cy):
    """Board pose from H = K [r1 r2 t]."""
    Kinv = jnp.array(
        [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]],
        H.dtype,
    )
    A = Kinv @ H
    s = 1.0 / jnp.linalg.norm(A[:, 0])
    r1 = A[:, 0] * s
    r2 = A[:, 1] * s
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], axis=1)
    # orthonormalize
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ Vt
    t = A[:, 2] * s
    return R, t


def calibrate(obj_xy, img_xy, mask, iters=25):
    """Full pipeline: per-view homographies -> Zhang K -> joint LM over
    [fx, fy, cx, cy, k1, k2, p1, p2, per-view (θ, t)].

    obj_xy [V, N, 2], img_xy [V, N, 2], mask [V, N].
    Returns (params dict, rms reprojection error in px).
    """
    V, N, _ = obj_xy.shape
    dtype = obj_xy.dtype
    Hs = [homography_dlt(obj_xy[v], img_xy[v], mask[v]) for v in range(V)]
    fx, fy, cx, cy = zhang_intrinsics(Hs)
    poses = [pose_from_homography(H, fx, fy, cx, cy) for H in Hs]
    w0 = jnp.concatenate(
        [
            jnp.concatenate([quat_log(rot_to_quat(R)), t])
            for R, t in poses
        ]
    )
    x0 = jnp.concatenate(
        [jnp.stack([fx, fy, cx, cy]), jnp.zeros(4, dtype), w0]
    )

    obj3 = jnp.concatenate([obj_xy, jnp.zeros((V, N, 1), dtype)], axis=-1)
    wmask = mask.astype(dtype)

    def residual(x):
        fx_, fy_, cx_, cy_ = x[0], x[1], x[2], x[3]
        k1, k2, p1, p2 = x[4], x[5], x[6], x[7]
        pv = x[8:].reshape(V, 6)

        def view(v):
            R = so3_exp_matrix(pv[v, 0:3])
            t = pv[v, 3:6]
            Xc = obj3[v] @ R.T + t
            xn = Xc[:, 0:2] / Xc[:, 2:3]
            r2 = jnp.sum(xn * xn, axis=1)
            rad = 1.0 + k1 * r2 + k2 * r2 * r2
            xd = (
                xn * rad[:, None]
                + jnp.stack(
                    [
                        2 * p1 * xn[:, 0] * xn[:, 1] + p2 * (r2 + 2 * xn[:, 0] ** 2),
                        p1 * (r2 + 2 * xn[:, 1] ** 2) + 2 * p2 * xn[:, 0] * xn[:, 1],
                    ],
                    axis=1,
                )
            )
            uv = xd * jnp.stack([fx_, fy_]) + jnp.stack([cx_, cy_])
            return (uv - img_xy[v]) * wmask[v][:, None]

        return jax.vmap(view)(jnp.arange(V)).reshape(-1)

    spec = lm_mod.SchurSpec(dense_dim=8 + 6 * V)
    out = lm_mod.lm_solve(
        residual, lambda x, d: x + d, x0, spec, lm_mod.LMConfig(num_iters=iters)
    )
    x = out.x
    n_obs = jnp.maximum(jnp.sum(wmask), 1.0)
    rms = jnp.sqrt(jnp.sum(residual(x) ** 2) / (2.0 * n_obs))
    return (
        dict(fx=x[0], fy=x[1], cx=x[2], cy=x[3], k1=x[4], k2=x[5], p1=x[6], p2=x[7]),
        rms,
    )
