"""Plücker / orthonormal 3D line algebra.

Semantics match the reference ``vins_estimator/src/utility/line_geometry.cpp``
(orth_to_plk:86, plk_to_orth:62, pi_from_ppp:134, pipi_plk:142,
plucker_origin, plk_to_pose:198, plk_from_pose:211) — re-derived for JAX.

A Plücker line is ``[n (3), v (3)]`` where ``v`` is the line direction and
``n = p × v`` its moment (p any point on the line).  The orthonormal (4-dof)
representation is ``[θ1, θ2, θ3, φ]``: ZYX-Euler angles of the SO(3) frame
U = [n̂, v̂, n̂×v̂] plus the SO(2) angle φ with (cos φ, sin φ) ∝ (‖n‖, ‖v‖).

Functions are single-instance; vmap at call sites.
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import skew


def _euler_zyx_to_rot(theta):
    """R = Rz(θ3) @ Ry(θ2) @ Rx(θ1) — exact matrix from line_geometry.cpp:99."""
    s1, c1 = jnp.sin(theta[..., 0]), jnp.cos(theta[..., 0])
    s2, c2 = jnp.sin(theta[..., 1]), jnp.cos(theta[..., 1])
    s3, c3 = jnp.sin(theta[..., 2]), jnp.cos(theta[..., 2])
    return jnp.stack(
        [
            jnp.stack([c2 * c3, s1 * s2 * c3 - c1 * s3, c1 * s2 * c3 + s1 * s3], -1),
            jnp.stack([c2 * s3, s1 * s2 * s3 + c1 * c3, c1 * s2 * s3 - s1 * c3], -1),
            jnp.stack([-s2, s1 * c2, c1 * c2], -1),
        ],
        axis=-2,
    )


def orth_to_plk(orth):
    """[θ1,θ2,θ3,φ] -> Plücker [n, v] with ‖n‖=cosφ, ‖v‖=sinφ up to scale."""
    R = _euler_zyx_to_rot(orth[..., 0:3])
    phi = orth[..., 3]
    w1 = jnp.cos(phi)[..., None]
    w2 = jnp.sin(phi)[..., None]
    n = w1 * R[..., :, 0]
    v = w2 * R[..., :, 1]
    return jnp.concatenate([n, v], axis=-1)


def plk_to_orth(plk):
    """Plücker [n, v] -> orthonormal [θ1,θ2,θ3,φ]."""
    n = plk[..., 0:3]
    v = plk[..., 3:6]
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    u1 = n / nn
    u2 = v / vn
    u3 = jnp.cross(u1, u2)
    th1 = jnp.arctan2(u2[..., 2], u3[..., 2])
    th2 = jnp.arcsin(jnp.clip(-u1[..., 2], -1.0, 1.0))
    th3 = jnp.arctan2(u1[..., 1], u1[..., 0])
    wn = jnp.sqrt(nn * nn + vn * vn)
    phi = jnp.arcsin(jnp.clip(vn / wn, -1.0, 1.0))[..., 0]
    return jnp.stack([th1, th2, th3, phi], axis=-1)


def pi_from_ppp(x1, x2, x3):
    """Plane [a,b,c,d] through three points (line_geometry.cpp:134)."""
    normal = jnp.cross(x1 - x3, x2 - x3)
    d = -jnp.sum(x3 * jnp.cross(x1, x2), axis=-1, keepdims=True)
    return jnp.concatenate([normal, d], axis=-1)


def pipi_plk(pi1, pi2):
    """Plücker line from two plane intersections (line_geometry.cpp:142).

    plk = [dp(0,3), dp(1,3), dp(2,3), -dp(1,2), dp(0,2), -dp(0,1)]
    with dp = pi1 pi2ᵀ - pi2 pi1ᵀ (the dual Plücker matrix).
    """
    dp = pi1[..., :, None] * pi2[..., None, :] - pi2[..., :, None] * pi1[..., None, :]
    return jnp.stack(
        [
            dp[..., 0, 3],
            dp[..., 1, 3],
            dp[..., 2, 3],
            -dp[..., 1, 2],
            dp[..., 0, 2],
            -dp[..., 0, 1],
        ],
        axis=-1,
    )


def plucker_origin(n, v):
    """Closest point on the line to the origin."""
    return jnp.cross(v, n) / jnp.sum(v * v, axis=-1, keepdims=True)


def plk_transform(plk_w, R_cw, t_cw):
    """Transform a world Plücker line into frame c given x_c = R_cw x_w + t_cw.

    nc = R n + [t]× R v ; vc = R v  (line_geometry.cpp plk_to_pose:198)
    """
    n = plk_w[..., 0:3]
    v = plk_w[..., 3:6]
    Rv = jnp.einsum("...ij,...j->...i", R_cw, v)
    nc = jnp.einsum("...ij,...j->...i", R_cw, n) + jnp.einsum(
        "...ij,...j->...i", skew(t_cw), Rv
    )
    return jnp.concatenate([nc, Rv], axis=-1)


def plk_transform_inv(plk_c, R_cw, t_cw):
    """Inverse transform: camera-frame line -> world (plk_from_pose:211)."""
    R_wc = jnp.swapaxes(R_cw, -1, -2)
    t_wc = -jnp.einsum("...ij,...j->...i", R_wc, t_cw)
    return plk_transform(plk_c, R_wc, t_wc)


def orth_boxplus(orth, delta):
    """Retraction for the 4-dof orthonormal parameters.

    Matches the reference's LineOrthParameterization::Plus
    (line_parameterization.cpp:7-90): U ← U·Rx(δ1)Ry(δ2)Rz(δ3) approximated
    there by composing the Euler frame; we implement the exact group update
    U ← U · exp([δθ]×), φ ← φ + δφ, then re-extract the Euler angles, which
    agrees to first order (what the optimizer needs).
    """
    R = _euler_zyx_to_rot(orth[..., 0:3])
    from .geometry import so3_exp_matrix

    Rnew = R @ so3_exp_matrix(delta[..., 0:3])
    phi = orth[..., 3] + delta[..., 3]
    th1 = jnp.arctan2(Rnew[..., 2, 1], Rnew[..., 2, 2])
    th2 = jnp.arcsin(jnp.clip(-Rnew[..., 2, 0], -1.0, 1.0))
    th3 = jnp.arctan2(Rnew[..., 1, 0], Rnew[..., 0, 0])
    return jnp.stack([th1, th2, th3, phi], axis=-1)
