"""Attention feature selector: anticipated-information greedy selection.

Parity with the reference's ``vins_estimator/src/feature_selector.{h,cpp}`` +
``utility/selector/`` (Carlone-style anticipation & attention):
- future state horizon propagated from the IMU model
  (generateFutureHorizon:229, HorizonGenerator::imu; HORIZON=4 frames,
  STATE_SIZE=9 -> 45x45 block info matrices, state_defs.h:16-41),
- prior information from the linear IMU model over the horizon
  (calcInfoFromRobotMotion / createLinearImuMatrices),
- per-feature information gain from projected visibility over the horizon
  with a nearest-neighbour depth guess (calcInfoFromFeatures, initKDTree,
  findNNDepth),
- greedy max-logdet subset selection (selectInformativeFeatures).

TPU re-design: the reference's lazy-greedy with sorted upper bounds
(sortedlogDetUB) exists to avoid evaluating every candidate per round on a
CPU; here every round evaluates ALL candidates' Δlogdet in one batched
45x45 slogdet — simpler and exact greedy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.geometry import quat_rotate, quat_to_rot

HORIZON = 4  # future frames (state_defs.h)
STATE_SIZE = 9  # [p(3), v(3), θ... reference uses 9: p,v,+?]; p,v,g-dir terms
DIM = HORIZON * STATE_SIZE  # 36 coupling blocks + anchor -> use H*9


class SelectorConfig(NamedTuple):
    max_features: int = 60  # kappa: budget of tracked features passed on
    init_threshold: int = 30  # pass-through when fewer candidates than this
    acc_var: float = 0.01
    pix_sigma: float = 1.0 / 460.0


def propagate_horizon(p0, q0, v0, ba, bg, acc_mean, gyr_mean, dt, g, horizon=HORIZON):
    """Constant-IMU forward propagation of the mean state over the horizon
    (HorizonGenerator::imu): returns (p [h+1,3], q [h+1,4], v [h+1,3])."""
    from ..models.imu import midpoint_propagate

    def step(carry, _):
        p, q, v = carry
        p2, q2, v2 = midpoint_propagate(
            p, q, v, ba, bg, acc_mean, gyr_mean, acc_mean, gyr_mean, dt, g
        )
        return (p2, q2, v2), (p2, q2, v2)

    (_, _, _), (ps, qs, vs) = jax.lax.scan(step, (p0, q0, v0), None, length=horizon)
    ps = jnp.concatenate([p0[None], ps])
    qs = jnp.concatenate([q0[None], qs])
    vs = jnp.concatenate([v0[None], vs])
    return ps, qs, vs


def imu_prior_information(dt, acc_var, horizon=HORIZON):
    """Block-tridiagonal information of the linear IMU model over the horizon
    (createLinearImuMatrices / calcInfoFromRobotMotion), condensed to the
    [h*9, h*9] prior Omega_IMU."""
    # per-step linear model x_{k+1} = A x_k + w, x = [p, v, extra]
    I3 = jnp.eye(3)
    Z3 = jnp.zeros((3, 3))
    A = jnp.block([[I3, dt * I3, Z3], [Z3, I3, Z3], [Z3, Z3, I3]])
    # process noise on v (accelerometer) and p through integration
    Qi = jnp.block(
        [
            [0.25 * dt**4 * acc_var * I3, 0.5 * dt**3 * acc_var * I3, Z3],
            [0.5 * dt**3 * acc_var * I3, dt**2 * acc_var * I3, Z3],
            [Z3, Z3, 1e-6 * I3],
        ]
    )
    Qi_inv = jnp.linalg.inv(Qi + 1e-9 * jnp.eye(9))
    n = horizon * STATE_SIZE
    O = jnp.zeros((n, n))
    for k in range(horizon):
        i = k * STATE_SIZE
        O = O.at[i : i + 9, i : i + 9].add(Qi_inv)
        if k > 0:
            j = (k - 1) * STATE_SIZE
            O = O.at[j : j + 9, j : j + 9].add(A.T @ Qi_inv @ A)
            O = O.at[j : j + 9, i : i + 9].add(-A.T @ Qi_inv)
            O = O.at[i : i + 9, j : j + 9].add(-Qi_inv @ A)
    return O


def feature_information(
    rays, depths, track_valid, ps, qs, q_ic, p_ic, pix_sigma, img_fov=0.75
):
    """Δ-information of each candidate feature over the horizon
    (calcInfoFromFeatures): anticipated projection jacobians accumulated into
    per-feature [h*9, h*9] blocks (position part only, like the reference's
    E_l F blocks).

    rays: [N, 3] current-frame bearing; depths: [N] NN depth guesses.
    Returns Omega_f [N, h*9, h*9].
    """
    N = rays.shape[0]
    h = ps.shape[0] - 1
    X_w = jax.vmap(
        lambda r, d: quat_rotate(qs[0], quat_rotate(q_ic, r * d) + p_ic) + ps[0]
    )(rays, depths)

    def per_feature(xw, ok):
        def per_frame(k):
            # project into horizon frame k+1
            q_wc = qs[k + 1]
            p_wc = ps[k + 1]
            from ..utils.geometry import pose_compose, pose_inverse, transform_point

            q_cw, p_cw = pose_inverse(*pose_compose(q_wc, p_wc, q_ic, p_ic))
            Xc = transform_point(q_cw, p_cw, xw)
            z = Xc[2]
            visible = (z > 0.2) & (jnp.abs(Xc[0] / z) < img_fov) & (
                jnp.abs(Xc[1] / z) < img_fov
            )
            # jacobian of the projection wrt the frame-k+1 position (p block)
            R_cw = quat_to_rot(q_cw)
            Jproj = (
                jnp.array([[1.0 / z, 0.0, -Xc[0] / z**2], [0.0, 1.0 / z, -Xc[1] / z**2]])
                @ R_cw
            ) / pix_sigma
            blk = Jproj.T @ Jproj * visible * ok  # [3,3] position information
            return blk

        blocks = jax.vmap(per_frame)(jnp.arange(h))  # [h, 3, 3]
        O = jnp.zeros((h * STATE_SIZE, h * STATE_SIZE))
        for k in range(h):
            i = k * STATE_SIZE
            O = O.at[i : i + 3, i : i + 3].set(blocks[k])
        return O

    return jax.vmap(per_feature)(X_w, track_valid.astype(rays.dtype))


def nn_depth_guess(rays, known_rays, known_depths, known_valid, default=5.0):
    """Depth guess per candidate from the angularly-nearest known landmark
    (initKDTree/findNNDepth, nanoflann kNN -> batched argmax of cosines)."""
    cos = rays @ known_rays.T  # [N, M]
    cos = jnp.where(known_valid[None, :], cos, -2.0)
    best = jnp.argmax(cos, axis=1)
    has = jnp.any(known_valid)
    d = jnp.where(
        jnp.max(cos, axis=1) > 0.9, known_depths[best], default
    )
    return jnp.where(has, d, jnp.full_like(d, default))


def select_features(
    omega_prior, omega_feats, candidate_mask, budget, cfg: SelectorConfig
):
    """Exact greedy max-logdet selection, fully batched per round
    (selectInformativeFeatures; logdet objective like the reference's
    logdetUB path).

    budget may be a TRACED integer: the scan always runs cfg.max_features
    rounds (static shape) and rounds past the budget are masked off, so one
    compiled program serves every per-frame budget.
    Returns (selected [N] bool, gains [N] first-round gains).
    """
    N = omega_feats.shape[0]
    dim = omega_prior.shape[0]

    def logdet(M):
        sign, ld = jnp.linalg.slogdet(M + 1e-9 * jnp.eye(dim))
        return ld

    def round_step(carry, round_idx):
        omega, selected = carry
        base = logdet(omega)
        cand = jax.vmap(lambda Of: logdet(omega + Of))(omega_feats)
        gain = jnp.where(candidate_mask & ~selected, cand - base, -jnp.inf)
        best = jnp.argmax(gain)
        improved = (gain[best] > 0.0) & (round_idx < budget)
        omega = jnp.where(improved, omega + omega_feats[best], omega)
        selected = selected.at[best].set(selected[best] | improved)
        return (omega, selected), gain[best]

    (omega, selected), gains = jax.lax.scan(
        round_step,
        (omega_prior, jnp.zeros(N, bool)),
        jnp.arange(cfg.max_features),
    )
    # first-round gains for diagnostics
    base0 = logdet(omega_prior)
    g0 = jax.vmap(lambda Of: logdet(omega_prior + Of))(omega_feats) - base0
    return selected, jnp.where(candidate_mask, g0, 0.0)
