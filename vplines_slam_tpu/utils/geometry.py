"""Rotation / quaternion / SE(3) algebra, dtype-preserving and jit/vmap-safe.

Semantics match the reference's ``vins_estimator/src/utility/utility.h``
(deltaQ:12, skewSymmetric:27, Qleft:48, Qright:60, R2ypr:66, ypr2R:84,
normalizeAngle:131) and ``utility.cpp`` (g2R) — re-derived for JAX, written
for single instances and meant to be ``vmap``-ed at call sites.

Quaternions are Hamilton convention, stored ``[w, x, y, z]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v):
    """3-vector -> 3x3 skew-symmetric matrix (utility.h:27)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q, p):
    """Hamilton product q ⊗ p, both [w,x,y,z]."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q (R(q) @ v)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rot(q):
    """Unit quaternion -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = jnp.asarray(2.0, q.dtype)
    r00 = 1 - two * (y * y + z * z)
    r01 = two * (x * y - w * z)
    r02 = two * (x * z + w * y)
    r10 = two * (x * y + w * z)
    r11 = 1 - two * (x * x + z * z)
    r12 = two * (y * z - w * x)
    r20 = two * (x * z - w * y)
    r21 = two * (y * z + w * x)
    r22 = 1 - two * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix -> unit quaternion [w,x,y,z], branchless (TPU-safe).

    Uses the four-candidate construction and selects the numerically best
    (largest pivot) via masked selects rather than control flow.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22  # 4w^2
    tx = 1.0 + m00 - m11 - m22  # 4x^2
    ty = 1.0 - m00 + m11 - m22  # 4y^2
    tz = 1.0 - m00 - m11 + m22  # 4z^2

    # candidate quaternions (unnormalised), one per pivot
    qw = jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], axis=-1)

    t = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(t, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [...,4cand,4comp]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0).astype(q.dtype)


def delta_quat(theta):
    """Small-angle quaternion [1, theta/2] (utility.h deltaQ:12, unnormalised)."""
    half = theta * jnp.asarray(0.5, theta.dtype)
    one = jnp.ones_like(theta[..., :1])
    return jnp.concatenate([one, half], axis=-1)


def so3_exp_quat(theta):
    """Exact exponential map: rotation vector -> unit quaternion."""
    angle_sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    angle = jnp.sqrt(angle_sq)
    # sinc(angle/2)/2 with Taylor fallback near zero
    small = angle_sq < jnp.asarray(1e-12, theta.dtype)
    half = angle * 0.5
    k = jnp.where(
        small,
        0.5 - angle_sq / 48.0,
        jnp.sin(half) / jnp.where(small, jnp.ones_like(angle), angle),
    )
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * theta], axis=-1)


def quat_log(q):
    """Unit quaternion -> rotation vector (inverse of so3_exp_quat)."""
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0).astype(q.dtype)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:4], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn < jnp.asarray(1e-12, q.dtype)
    scale = jnp.where(small, 2.0 / jnp.clip(w, 1e-6), angle / jnp.where(small, 1.0, vn))
    return scale * q[..., 1:4]


def so3_exp_matrix(theta):
    return quat_to_rot(so3_exp_quat(theta))


def quat_left(q):
    """Left-multiplication matrix: quat_mul(q, p) == quat_left(q) @ p (utility.h:48)."""
    w = q[..., 0]
    v = q[..., 1:4]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)],
        axis=-1,
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_right(p):
    """Right-multiplication matrix: quat_mul(q, p) == quat_right(p) @ q (utility.h:60)."""
    w = p[..., 0]
    v = p[..., 1:4]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * jnp.eye(3, dtype=p.dtype) - skew(v)],
        axis=-1,
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_from_two_vectors(a, b):
    """Shortest-arc quaternion rotating unit direction a onto b."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    w = 1.0 + d
    # guard antipodal: fall back to any orthogonal axis
    ortho = jnp.where(
        jnp.abs(a[..., 0:1]) < 0.9,
        jnp.cross(a, jnp.array([1.0, 0.0, 0.0], dtype=a.dtype)),
        jnp.cross(a, jnp.array([0.0, 1.0, 0.0], dtype=a.dtype)),
    )
    anti = w[..., 0] < 1e-8
    q = jnp.concatenate([w, c], axis=-1)
    q_anti = jnp.concatenate([jnp.zeros_like(w), ortho], axis=-1)
    return quat_normalize(jnp.where(anti[..., None], q_anti, q))


def rot_to_ypr(R):
    """Rotation matrix -> [yaw, pitch, roll] in DEGREES (utility.h R2ypr:66)."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    rad2deg = jnp.asarray(180.0 / jnp.pi, R.dtype)
    return jnp.stack([y, p, r], axis=-1) * rad2deg


def ypr_to_rot(ypr):
    """[yaw, pitch, roll] in DEGREES -> rotation matrix Rz@Ry@Rx (utility.h:84)."""
    deg2rad = jnp.asarray(jnp.pi / 180.0, ypr.dtype)
    y, p, r = ypr[..., 0] * deg2rad, ypr[..., 1] * deg2rad, ypr[..., 2] * deg2rad
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        axis=-2,
    )


def gravity_to_rot(g):
    """R0 s.t. R0 @ ĝ == ẑ with zero yaw (utility.cpp g2R semantics)."""
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    R0 = quat_to_rot(quat_from_two_vectors(ng1, ng2))
    yaw = rot_to_ypr(R0)[..., 0]
    fix = ypr_to_rot(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], -1))
    return fix @ R0


def normalize_angle_deg(a):
    """Wrap to (-180, 180] (utility.h normalizeAngle:131)."""
    return a - 360.0 * jnp.floor((a + 180.0) / 360.0)


# ---------------------------------------------------------------------------
# SE(3) helpers: a pose is the tuple (q [..,4], p [..,3]) mapping body->world.
# ---------------------------------------------------------------------------


def pose_inverse(q, p):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, p)


def pose_compose(q1, p1, q2, p2):
    """(q1,p1) ∘ (q2,p2): apply 2 then 1."""
    return quat_mul(q1, q2), quat_rotate(q1, p2) + p1


def transform_point(q, p, x):
    return quat_rotate(q, x) + p


def pose_boxplus(q, p, dq_dp):
    """Retraction used by the solver: p+=dp, q = q ⊗ exp(dθ).

    Matches the reference's PoseLocalParameterization::Plus
    (pose_local_parameterization.cpp:1-27) which right-multiplies deltaQ.
    """
    dp = dq_dp[..., 0:3]
    dth = dq_dp[..., 3:6]
    return quat_normalize(quat_mul(q, so3_exp_quat(dth))), p + dp
