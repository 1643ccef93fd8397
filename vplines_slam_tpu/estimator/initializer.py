"""Visual-inertial initialization: SFM + gyro-bias/velocity/gravity/scale alignment.

Parity with the reference's initialization stack:
- relative pose + parallax gate ............ estimator.cpp relativePose:590-622
- window SFM (essential, triangulate, PnP) . initial_sfm.cpp GlobalSFM::construct
- gyro bias LS ............................. initial_aligment.cpp solveGyroscopeBias:3
- velocity/gravity/scale linear solve ...... initial_aligment.cpp LinearAlignment:125
- gravity refinement on tangent basis ...... initial_aligment.cpp RefineGravity:55
- state application (rescale, gravity-align) estimator.cpp visualInitialAlign:512-588

Re-designed for JAX: every stage is masked fixed-shape linear algebra; the
SFM refinement reuses the shared LM solver instead of a ceres problem.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors import residuals as res
from ..models import imu as imu_mod
from ..ops import mvg
from ..solver import lm as lm_mod
from ..utils.geometry import (
    gravity_to_rot,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rot,
    rot_to_quat,
    rot_to_ypr,
    so3_exp_quat,
    ypr_to_rot,
)


def solve_gyro_bias(q_vis_rel, pre: imu_mod.Preintegration, valid):
    """Gyro bias from SFM-vs-preintegration rotation LS (solveGyroscopeBias:3).

    q_vis_rel: [K, 4] visual relative body rotations q_{b_i -> b_{i+1}};
    pre: batched preintegrations over the K intervals; valid: [K].
    """
    dq_dbg = pre.jacobian[:, 3:6, 12:15]  # [K,3,3]
    err = 2.0 * jax.vmap(lambda dq, qv: quat_mul(quat_conj(dq), qv)[1:4])(
        pre.delta_q, q_vis_rel
    )
    w = valid.astype(err.dtype)[:, None]
    A = jnp.einsum("kij,kil->jl", dq_dbg * w[:, :, None], dq_dbg)
    b = jnp.einsum("kij,ki->j", dq_dbg, err * w)
    return jnp.linalg.solve(A + 1e-12 * jnp.eye(3, dtype=A.dtype), b)


def _alignment_system(R_b, T_c, pre: imu_mod.Preintegration, valid, tic, g_dirs=None, g0=None):
    """Shared assembly for LinearAlignment / RefineGravity.

    R_b: [F, 3, 3] body rotation in c0; T_c: [F, 3] camera position in c0
    (unscaled); pre: K=F-1 batched preintegrations; tic: camera-IMU lever arm.
    If g_dirs ([3,2] tangent basis) is given, solves the 2-dof gravity
    refinement around g0; otherwise the full 3-dof gravity.
    """
    dtype = T_c.dtype
    F = T_c.shape[0]
    K = F - 1
    gdim = 3 if g_dirs is None else 2
    n_state = F * 3 + gdim + 1

    Ri_T = jnp.swapaxes(R_b[:-1], -1, -2)  # [K,3,3] = R_biᵀ (c0 basis)
    Rj = R_b[1:]
    dt = pre.sum_dt  # [K]
    I3 = jnp.eye(3, dtype=dtype)

    # per-pair 6x10 blocks (initial_aligment.cpp:143-158)
    A_vi_p = -dt[:, None, None] * I3
    A_g_p = Ri_T * (0.5 * dt * dt)[:, None, None]
    A_s_p = jnp.einsum("kij,kj->ki", Ri_T, T_c[1:] - T_c[:-1]) / 100.0
    b_p = (
        pre.delta_p
        + jnp.einsum("kij,kjl,l->ki", Ri_T, Rj, tic)
        - tic[None, :]
    )
    A_vi_v = -jnp.broadcast_to(I3, (K, 3, 3))
    A_vj_v = Ri_T @ Rj
    A_g_v = Ri_T * dt[:, None, None]
    b_v = pre.delta_v

    if g_dirs is not None:
        A_g_p = A_g_p @ g_dirs
        A_g_v = A_g_v @ g_dirs
        b_p = b_p - jnp.einsum("kij,j->ki", Ri_T * (0.5 * dt * dt)[:, None, None], g0)
        b_v = b_v - jnp.einsum("kij,j->ki", Ri_T * dt[:, None, None], g0)

    A = jnp.zeros((n_state, n_state), dtype)
    b = jnp.zeros((n_state,), dtype)
    w = valid.astype(dtype)

    def pair_system(k):
        # rows: [p-residual(3); v-residual(3)], cols: [v_i(3), v_j(3), g(gdim), s(1)]
        top = jnp.concatenate(
            [A_vi_p[k], jnp.zeros((3, 3), dtype), A_g_p[k], A_s_p[k][:, None]], axis=1
        )
        bot = jnp.concatenate(
            [A_vi_v[k], A_vj_v[k], A_g_v[k], jnp.zeros((3, 1), dtype)], axis=1
        )
        tA = jnp.concatenate([top, bot], axis=0) * w[k]
        tb = jnp.concatenate([b_p[k], b_v[k]]) * w[k]
        return tA.T @ tA, tA.T @ tb

    rA, rb = jax.vmap(pair_system)(jnp.arange(K))

    # scatter the per-pair 10x10 into the global system
    def scatter(carry, k):
        A, b = carry
        sl_v = 3 * k
        g_off = 3 * F
        idx = jnp.concatenate(
            [
                sl_v + jnp.arange(6),
                g_off + jnp.arange(gdim + 1),
            ]
        )
        A = A.at[idx[:, None], idx[None, :]].add(rA[k])
        b = b.at[idx].add(rb[k])
        return (A, b), None

    (A, b), _ = jax.lax.scan(scatter, (A, b), jnp.arange(K))
    A = A * 1000.0
    b = b * 1000.0
    x = jnp.linalg.solve(A + 1e-10 * jnp.eye(n_state, dtype=dtype), b)
    return x


def linear_alignment(R_b, T_c, pre, valid, tic, g_norm):
    """Velocities (body frame), gravity in c0, metric scale (LinearAlignment:125).

    Returns (v_body [F,3], g_c0 [3], s, ok)."""
    F = T_c.shape[0]
    x = _alignment_system(R_b, T_c, pre, valid, tic)
    s = x[-1] / 100.0
    g = x[3 * F : 3 * F + 3]
    ok = (jnp.abs(jnp.linalg.norm(g) - g_norm) < 1.0) & (s > 0)

    # gravity refinement, 4 fixed iterations (RefineGravity:55)
    def refine(g0, _):
        g0n = g0 / jnp.linalg.norm(g0) * g_norm
        a = g0n / jnp.linalg.norm(g0n)
        tmp = jnp.where(
            jnp.abs(a[2]) > 0.999,
            jnp.array([1.0, 0.0, 0.0], a.dtype),
            jnp.array([0.0, 0.0, 1.0], a.dtype),
        )
        b1 = tmp - a * jnp.dot(a, tmp)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(a, b1)
        basis = jnp.stack([b1, b2], axis=1)  # [3,2]
        xr = _alignment_system(R_b, T_c, pre, valid, tic, g_dirs=basis, g0=g0n)
        dg = xr[3 * F : 3 * F + 2]
        return g0n + basis @ dg, xr

    g_ref, xr = jax.lax.scan(refine, g, None, length=4)[0], None
    # re-run last to fetch velocities/scale at the refined gravity
    a = g_ref / jnp.linalg.norm(g_ref)
    tmp = jnp.where(
        jnp.abs(a[2]) > 0.999,
        jnp.array([1.0, 0.0, 0.0], a.dtype),
        jnp.array([0.0, 0.0, 1.0], a.dtype),
    )
    b1 = tmp - a * jnp.dot(a, tmp)
    b1 = b1 / jnp.linalg.norm(b1)
    basis = jnp.stack([b1, jnp.cross(a, b1)], axis=1)
    xr = _alignment_system(R_b, T_c, pre, valid, tic, g_dirs=basis, g0=g_ref)
    s_ref = xr[-1] / 100.0
    v = xr[: 3 * F].reshape(F, 3)
    ok = ok & (s_ref > 0)
    return v, g_ref, s_ref, ok


class SfmResult(NamedTuple):
    R_c0_c: jnp.ndarray  # [F, 3, 3] camera-k rotation in c0 (c0<-ck direction vectors)
    t_c0_c: jnp.ndarray  # [F, 3] camera-k position in c0
    ok: jnp.ndarray


def window_sfm(obs, mask, l, key, lm_iters=15):
    """Structure-from-motion over the init window (GlobalSFM::construct parity).

    obs: [N, F, 2] normalized observations; mask: [N, F]; l: reference frame
    index (static python int or traced).  Frame F-1 is the 'current' frame.

    Pipeline: essential(l, F-1) -> triangulate -> DLT PnP every frame ->
    joint BA with the shared LM solver (pose of l fixed as gauge).
    """
    N, F, _ = obs.shape
    dtype = obs.dtype

    co_mask = mask[:, l] & mask[:, F - 1]
    E, inl, n_inl = mvg.ransac_essential(obs[:, l], obs[:, F - 1], co_mask, key)
    R_rel, t_rel, _ = mvg.decompose_essential(E, obs[:, l], obs[:, F - 1], inl)
    # points in frame l
    X_l, z_l = mvg.triangulate_two_view(R_rel, t_rel, obs[:, l], obs[:, F - 1])
    pt_ok = inl & (z_l > 0.1)

    # PnP every frame against the frame-l structure
    def pnp_frame(f):
        m = pt_ok & mask[:, f]
        R0, t0, ok = mvg.pnp_dlt(X_l, obs[:, f], m)
        R1, t1 = mvg.pnp_refine(R0, t0, X_l, obs[:, f], m)
        return R1, t1, ok

    R_cl, t_cl, pnp_ok = jax.vmap(pnp_frame)(jnp.arange(F))  # x_cf = R x_l + t

    # joint refinement: poses (frame l fixed) + inverse depths in frame l
    q_cl = jax.vmap(rot_to_quat)(R_cl)
    invd0 = 1.0 / jnp.clip(z_l, 0.05, 1e3)

    obs_l = jnp.concatenate([obs[:, l], jnp.ones((N, 1), dtype)], axis=-1)
    obs_h = jnp.concatenate([obs, jnp.ones((N, F, 1), dtype)], axis=-1)
    ident = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    zero3 = jnp.zeros(3, dtype)
    res_mask = (pt_ok[:, None] & mask).astype(dtype)

    def residual(x):
        q_all, t_all, invd = x

        def point_frame(n, f):
            # residual of point n in frame f; pose maps l->f, anchor = l
            q_fw, t_fw = q_all[f], t_all[f]  # camera-from-l
            # express as body poses for point_reprojection: poses are world(l)->cam
            # point_reprojection expects body-in-world; convert: world = l frame
            q_wf = quat_conj(q_fw)
            p_wf = -quat_rotate(q_wf, t_fw)
            return res.point_reprojection(
                zero3, ident, p_wf, q_wf, zero3, ident, invd[n], obs_l[n], obs_h[n, f]
            )

        r = jax.vmap(
            lambda n: jax.vmap(lambda f: point_frame(n, f))(jnp.arange(F))
        )(jnp.arange(N))
        return (r * res_mask[:, :, None]).reshape(-1)

    def retract(x, delta):
        q_all, t_all, invd = x
        d_pose = delta[: 6 * F].reshape(F, 6)
        # gauge: freeze frame l (zero its update)
        gauge = (jnp.arange(F) != l).astype(dtype)[:, None]
        d_pose = d_pose * gauge
        q_new = jax.vmap(
            lambda q, d: quat_normalize(quat_mul(q, so3_exp_quat(d)))
        )(q_all, d_pose[:, 0:3])
        t_new = t_all + d_pose[:, 3:6]
        return q_new, t_new, invd + delta[6 * F :]

    spec = lm_mod.SchurSpec(dense_dim=6 * F, n_scalar=N)
    out = lm_mod.lm_solve(
        residual, retract, (q_cl, t_cl, invd0), spec, lm_mod.LMConfig(num_iters=lm_iters)
    )
    q_fin, t_fin, invd_fin = out.x

    # convert camera-from-l to camera-in-c0 (c0 := frame l)
    R_lc = jax.vmap(lambda q: quat_to_rot(quat_conj(q)))(q_fin)
    t_lc = jax.vmap(lambda q, t: -quat_rotate(quat_conj(q), t))(q_fin, t_fin)
    ok = jnp.all(pnp_ok) & (n_inl >= 12)
    return SfmResult(R_c0_c=R_lc, t_c0_c=t_lc, ok=ok), invd_fin, pt_ok


class InitResult(NamedTuple):
    p: jnp.ndarray  # [F,3] body positions, world (gravity-aligned, metric)
    q: jnp.ndarray  # [F,4]
    v: jnp.ndarray  # [F,3]
    bg: jnp.ndarray  # [3]
    g_world: jnp.ndarray  # [3]
    scale: jnp.ndarray
    ok: jnp.ndarray


def visual_inertial_align(sfm: SfmResult, pre, valid, q_ic, p_ic, g_norm):
    """Full alignment: gyro bias -> repropagation (first-order) -> linear
    alignment -> gravity-frame rotation (visualInitialAlign:512-588).

    pre: batched preintegrations between consecutive frames (computed at
    bg=0); the gyro-bias correction is applied through the preintegration
    jacobians (first-order), matching the accuracy of repropagate for the
    small biases this stage estimates.
    """
    F = sfm.t_c0_c.shape[0]
    R_ic = quat_to_rot(q_ic)
    # body rotation in c0: R_c0_b = R_c0_c @ R_ic^T
    R_b = sfm.R_c0_c @ R_ic.T[None]
    q_b = jax.vmap(rot_to_quat)(R_b)

    q_rel = jax.vmap(lambda i: quat_mul(quat_conj(q_b[i]), q_b[i + 1]))(
        jnp.arange(F - 1)
    )
    dbg = solve_gyro_bias(q_rel, pre, valid)

    # first-order repropagation of the preintegration to the new bias
    dq_dbg = pre.jacobian[:, 3:6, 12:15]
    dp_dbg = pre.jacobian[:, 0:3, 12:15]
    dv_dbg = pre.jacobian[:, 6:9, 12:15]
    delta_q = jax.vmap(
        lambda q, J: quat_normalize(
            quat_mul(q, jnp.concatenate([jnp.ones(1, q.dtype), 0.5 * (J @ dbg)]))
        )
    )(pre.delta_q, dq_dbg)
    pre_corr = pre._replace(
        delta_q=delta_q,
        delta_p=pre.delta_p + jnp.einsum("kij,j->ki", dp_dbg, dbg),
        delta_v=pre.delta_v + jnp.einsum("kij,j->ki", dv_dbg, dbg),
        linearized_bg=jnp.broadcast_to(dbg, pre.linearized_bg.shape),
    )

    v_body, g_c0, s, ok = linear_alignment(
        R_b, sfm.t_c0_c, pre_corr, valid, p_ic, g_norm
    )

    # metric body positions in c0: P = s*T_cam - R_b @ p_ic, re-based to frame 0
    P = s * sfm.t_c0_c - jnp.einsum("fij,j->fi", R_b, p_ic)
    P = P - P[0]
    V = jnp.einsum("fij,fj->fi", R_b, v_body)  # world(c0)-frame velocities

    # rotate everything so gravity is +z and frame-0 yaw is zero
    R0 = gravity_to_rot(g_c0)
    yaw = rot_to_ypr(R0 @ R_b[0])[0]
    z = jnp.zeros_like(yaw)
    R0 = ypr_to_rot(jnp.stack([-yaw, z, z])) @ R0
    P = jnp.einsum("ij,fj->fi", R0, P)
    V = jnp.einsum("ij,fj->fi", R0, V)
    R_w = R0[None] @ R_b
    q_w = jax.vmap(rot_to_quat)(R_w)
    g_world = R0 @ g_c0

    return InitResult(p=P, q=q_w, v=V, bg=dbg, g_world=g_world, scale=s, ok=ok & sfm.ok)


def choose_reference_frame(obs, mask, min_parallax=30.0 / 460.0, min_corres=20):
    """Pick the earliest frame with enough parallax + correspondences vs the
    newest (estimator.cpp relativePose:590-622).  Returns (l, found)."""
    N, F, _ = obs.shape
    newest = F - 1

    def stats(f):
        co = mask[:, f] & mask[:, newest]
        d = jnp.linalg.norm(obs[:, f] - obs[:, newest], axis=-1)
        n = jnp.sum(co.astype(jnp.int32))
        avg = jnp.sum(d * co) / jnp.maximum(n, 1)
        return n, avg

    ns, ps = jax.vmap(stats)(jnp.arange(F))
    good = (ns >= min_corres) & (ps > min_parallax)
    # earliest good frame (exclude the newest itself)
    good = good.at[newest].set(False)
    l = jnp.argmax(good)  # first True
    return l, jnp.any(good)
