"""Sliding-window state, residual stack, BA solve, marginalization and slide.

The device-resident core of the VIO estimator — the TPU-native re-design of
``vins_estimator/src/estimator.cpp`` (solveOdometry:624, optimizationwithLine
:1043-1447, slideWindow:1731) and ``feature_manager.{h,cpp}``:

- pointer-chased ``list<FeaturePerId>`` becomes fixed-capacity SoA tensors
  with validity masks (tracks never reallocate; slots are reused),
- the ceres problem becomes one masked residual stack solved by the shared
  LM/Schur engine (solver/lm.py),
- marginalization reuses the same stack restricted to frame-0 factors
  (estimator.cpp:1229-1447) through solver/marginalization.py,
- window slides are pure gathers (fixed shapes, no reallocation).

Parameter layout of the dense block (delta space):
  frame k in [0, NF): [δp(3), δθ(3), δv(3), δba(3), δbg(3)] at offset 15k
  extrinsic:          [δp_ic(3), δθ_ic(3)] at offset 15·NF
  relocalization pose: [δp_relo(3), δθ_relo(3)] at offset 15·NF + 6
  => ND = 15·NF + 12.  Landmarks: [inv depths (MAXP) | line orth (4·MAXL)].

The relocalization pose implements the reference's fast-relocalization
factors (estimator.cpp:1174-1206 + setReloFrame:1848): when the pose graph
verifies a loop, the matched old-keyframe observations are optimized
jointly with the window against a 6-dof "relo" pose seeded at the old
keyframe's VIO pose; the refined relative pose feeds back to the pose
graph (keyframe updateKeyFrameLoop parity).  The 6 extra dense dims are
always present (fixed shapes); their residuals are masked by relo_valid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors import residuals as res
from ..models import imu as imu_mod
from ..solver import lm as lm_mod
from ..solver import marginalization as marg_mod
from ..utils.geometry import (
    quat_conj,
    quat_log,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rot,
    rot_to_quat,
    rot_to_ypr,
    so3_exp_quat,
    transform_point,
    ypr_to_rot,
)
from ..utils.plucker import (
    orth_boxplus,
    orth_to_plk,
    pi_from_ppp,
    pipi_plk,
    plk_to_orth,
    plk_transform,
    plk_transform_inv,
)


class WindowConfig(NamedTuple):
    window: int = 10  # keyframes (parameters.h WINDOW_SIZE)
    max_points: int = 128
    max_lines: int = 32
    max_imu: int = 64  # IMU samples capacity per interval
    g_norm: float = 9.81007
    point_sqrt_info: float = res.POINT_SQRT_INFO
    line_sqrt_info: float = res.LINE_SQRT_INFO
    vp_sqrt_info: float = res.VP_SQRT_INFO
    huber_delta: float = 1.0  # reference HuberLoss(1.0)
    min_parallax: float = 10.0 / 460.0  # keyframe threshold (parameters.cpp MIN_PARALLAX)
    ba_iters: int = 8  # NUM_ITERATIONS
    line_min_obs: int = 5  # LINE_MIN_OBS (parameters.h); tests may relax
    # χ²-consistency cap on the marginalization prior (see marginalize_old):
    # α = min(1, cap/ms) where ms = ENERGY-WEIGHTED mean whitened square
    # (Σr⁴/Σr², = 3σ² on clean gaussian rows) of the marginalized rows.
    # 0.6 ≈ 3 × the clean-data plain-mean level of the euroc whitening.
    prior_chi2_cap: float = 0.6
    init_min_corres: int = 20  # relativePose correspondence gate
    init_min_parallax: float = 30.0 / 460.0  # relativePose parallax gate
    # consistent-marginalization policy (see slide.slide_window_old): retire
    # tracks/lines whose information was fully absorbed into the prior
    # instead of double-counting them (the reference re-anchors and
    # double-counts, removeBackShiftDepth:800).  Independently toggleable per
    # landmark class for ablation; r5 measurement (docs/ACCURACY.md): point
    # retirement is what fixes the noise scaling.  For lines, BOTH reference
    # double-counting (a frame-0-anchored line is re-folded on EVERY slide —
    # ~9x over-counting at weight 306) and r4 retirement (starves long-lived
    # structural lines) measured worse than the clean policy: keep lines
    # LIVE-ONLY — their factors never enter the prior (marg_lines=False), so
    # they constrain every window exactly once and never stale.
    retire_points: bool = True
    retire_lines: bool = False
    marg_lines: bool = False  # True = reference parity (fold + re-anchor)

    @property
    def nf(self):
        return self.window + 1

    @property
    def nd(self):
        return 15 * self.nf + 12  # frames + extrinsic + relo pose

    @property
    def n_landmark(self):
        return self.max_points + 4 * self.max_lines

    @property
    def n_total(self):
        return self.nd + self.n_landmark


class WindowState(NamedTuple):
    """Optimizable window state (estimator.h Ps/Rs/Vs/Bas/Bgs + extrinsic)."""

    p: jnp.ndarray  # [NF, 3]
    q: jnp.ndarray  # [NF, 4]
    v: jnp.ndarray  # [NF, 3]
    ba: jnp.ndarray  # [NF, 3]
    bg: jnp.ndarray  # [NF, 3]
    p_ic: jnp.ndarray  # [3]
    q_ic: jnp.ndarray  # [4]
    p_relo: jnp.ndarray  # [3] relocalization (old keyframe) pose
    q_relo: jnp.ndarray  # [4]


class TrackData(NamedTuple):
    """Fixed-capacity SoA feature/line tables + IMU intervals + prior."""

    # point tracks (feature_manager FeaturePerId, SoA)
    pt_id: jnp.ndarray  # [MAXP] int32, -1 = empty slot
    pt_obs: jnp.ndarray  # [MAXP, NF, 3] normalized rays (z=1)
    pt_mask: jnp.ndarray  # [MAXP, NF] bool
    pt_start: jnp.ndarray  # [MAXP] int32 anchor frame
    pt_inv_depth: jnp.ndarray  # [MAXP]
    pt_solved: jnp.ndarray  # [MAXP] bool (depth valid)
    # line tracks (lineFeaturePerId, SoA)
    ln_id: jnp.ndarray  # [MAXL] int32
    ln_obs: jnp.ndarray  # [MAXL, NF, 4] endpoints on normalized plane
    ln_mask: jnp.ndarray  # [MAXL, NF]
    ln_vp: jnp.ndarray  # [MAXL, NF, 3] observed VP direction
    ln_vp_mask: jnp.ndarray  # [MAXL, NF]
    ln_orth: jnp.ndarray  # [MAXL, 4] world-frame orthonormal coords
    ln_solved: jnp.ndarray  # [MAXL]
    # IMU intervals k -> k+1 (raw, for re-preintegration) + preintegrations
    imu_dt: jnp.ndarray  # [NF-1, MAXI]
    imu_acc: jnp.ndarray  # [NF-1, MAXI+1, 3]
    imu_gyr: jnp.ndarray  # [NF-1, MAXI+1, 3]
    imu_mask: jnp.ndarray  # [NF-1, MAXI]
    imu_valid: jnp.ndarray  # [NF-1] bool
    # precomputed preintegration per interval (integration happens ONCE at
    # ingest; the BA residual applies only the first-order bias correction,
    # exactly like the reference's IMUFactor over a stored IntegrationBase —
    # never re-integrates inside the optimizer)
    imu_pre: imu_mod.Preintegration  # batched [NF-1, ...]
    imu_sqrt: jnp.ndarray  # [NF-1, 15, 15] whitening transforms
    # relocalization match points (slot-aligned with pt tracks; consumed by
    # exactly one BA solve — estimator.cpp match_points semantics)
    relo_obs: jnp.ndarray  # [MAXP, 3] normalized rays in the OLD keyframe cam
    relo_mask: jnp.ndarray  # [MAXP] bool: slot has a verified loop match
    relo_valid: jnp.ndarray  # [] bool: a relocalization frame is active
    # timestamps of the window frames + the stamp of the frame the active
    # relocalization refers to (estimator.h relo_frame_stamp /
    # relo_frame_local_index semantics): the staged loop pipeline verifies a
    # keyframe several frames after it was the newest, so the refined
    # relative pose must be extracted against the window slot MATCHING THE
    # STAMP, not against a fixed slot (r5: a fixed nf-2 paired the relo pose
    # with a frame ~4 s newer — every refined loop edge carried ~45 deg of
    # spurious yaw and the PGO made the corrected path WORSE than raw VIO)
    frame_t: jnp.ndarray  # [NF] frame stamps (-1 = unset)
    relo_stamp: jnp.ndarray  # [] stamp of the loop keyframe (-2 = none)
    # prior
    prior: marg_mod.Prior
    prior_state: WindowState  # linearization point of the prior


def empty_state(cfg: WindowConfig, dtype=jnp.float64) -> WindowState:
    nf = cfg.nf
    q0 = jnp.zeros((nf, 4), dtype).at[:, 0].set(1.0)
    return WindowState(
        p=jnp.zeros((nf, 3), dtype),
        q=q0,
        v=jnp.zeros((nf, 3), dtype),
        ba=jnp.zeros((nf, 3), dtype),
        bg=jnp.zeros((nf, 3), dtype),
        p_ic=jnp.zeros(3, dtype),
        q_ic=jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
        p_relo=jnp.zeros(3, dtype),
        q_relo=jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
    )


def _identity_pre(n, dtype):
    """Batched no-op preintegrations for empty intervals."""
    return imu_mod.Preintegration(
        delta_p=jnp.zeros((n, 3), dtype),
        delta_q=jnp.zeros((n, 4), dtype).at[:, 0].set(1.0),
        delta_v=jnp.zeros((n, 3), dtype),
        jacobian=jnp.broadcast_to(jnp.eye(15, dtype=dtype), (n, 15, 15)),
        covariance=jnp.broadcast_to(jnp.eye(15, dtype=dtype), (n, 15, 15)),
        sum_dt=jnp.zeros((n,), dtype),
        linearized_ba=jnp.zeros((n, 3), dtype),
        linearized_bg=jnp.zeros((n, 3), dtype),
    )


def empty_tracks(cfg: WindowConfig, dtype=jnp.float64) -> TrackData:
    nf, P, L, I = cfg.nf, cfg.max_points, cfg.max_lines, cfg.max_imu
    return TrackData(
        pt_id=jnp.full((P,), -1, jnp.int32),
        pt_obs=jnp.zeros((P, nf, 3), dtype).at[..., 2].set(1.0),
        pt_mask=jnp.zeros((P, nf), bool),
        pt_start=jnp.zeros((P,), jnp.int32),
        pt_inv_depth=jnp.full((P,), 0.2, dtype),
        pt_solved=jnp.zeros((P,), bool),
        ln_id=jnp.full((L,), -1, jnp.int32),
        ln_obs=jnp.zeros((L, nf, 4), dtype),
        ln_mask=jnp.zeros((L, nf), bool),
        ln_vp=jnp.zeros((L, nf, 3), dtype).at[..., 2].set(1.0),
        ln_vp_mask=jnp.zeros((L, nf), bool),
        ln_orth=jnp.zeros((L, 4), dtype),
        ln_solved=jnp.zeros((L,), bool),
        imu_dt=jnp.zeros((nf - 1, I), dtype),
        imu_acc=jnp.zeros((nf - 1, I + 1, 3), dtype),
        imu_gyr=jnp.zeros((nf - 1, I + 1, 3), dtype),
        imu_mask=jnp.zeros((nf - 1, I), bool),
        imu_valid=jnp.zeros((nf - 1,), bool),
        imu_pre=_identity_pre(nf - 1, dtype),
        imu_sqrt=jnp.broadcast_to(jnp.eye(15, dtype=dtype), (nf - 1, 15, 15)),
        relo_obs=jnp.zeros((P, 3), dtype).at[:, 2].set(1.0),
        relo_mask=jnp.zeros((P,), bool),
        relo_valid=jnp.asarray(False),
        frame_t=jnp.full((nf,), -1.0, dtype),
        relo_stamp=jnp.asarray(-2.0, dtype),
        prior=marg_mod.empty_prior(cfg.nd, dtype),
        prior_state=empty_state(cfg, dtype),
    )


# ---------------------------------------------------------------------------
# retraction / manifold difference on the dense block
# ---------------------------------------------------------------------------


def retract_state(state: WindowState, d: jnp.ndarray, cfg: WindowConfig) -> WindowState:
    nf = cfg.nf
    df = d[: 15 * nf].reshape(nf, 15)
    q_new = jax.vmap(lambda q, w: quat_normalize(quat_mul(q, so3_exp_quat(w))))(
        state.q, df[:, 3:6]
    )
    de = d[15 * nf : 15 * nf + 6]
    dr = d[15 * nf + 6 : 15 * nf + 12]
    return WindowState(
        p=state.p + df[:, 0:3],
        q=q_new,
        v=state.v + df[:, 6:9],
        ba=state.ba + df[:, 9:12],
        bg=state.bg + df[:, 12:15],
        p_ic=state.p_ic + de[0:3],
        q_ic=quat_normalize(quat_mul(state.q_ic, so3_exp_quat(de[3:6]))),
        p_relo=state.p_relo + dr[0:3],
        q_relo=quat_normalize(quat_mul(state.q_relo, so3_exp_quat(dr[3:6]))),
    )


def boxminus_state(x: WindowState, x0: WindowState, cfg: WindowConfig) -> jnp.ndarray:
    """Manifold difference used to replay the prior: x ⊟ x0 in delta layout."""
    dth = jax.vmap(lambda q0, q1: quat_log(quat_mul(quat_conj(q0), q1)))(x0.q, x.q)
    df = jnp.concatenate(
        [x.p - x0.p, dth, x.v - x0.v, x.ba - x0.ba, x.bg - x0.bg], axis=-1
    ).reshape(-1)
    de = jnp.concatenate(
        [x.p_ic - x0.p_ic, quat_log(quat_mul(quat_conj(x0.q_ic), x.q_ic))]
    )
    dr = jnp.concatenate(
        [x.p_relo - x0.p_relo, quat_log(quat_mul(quat_conj(x0.q_relo), x.q_relo))]
    )
    return jnp.concatenate([df, de, dr])


# ---------------------------------------------------------------------------
# residual stack
# ---------------------------------------------------------------------------


class ResidualWeights(NamedTuple):
    use_points: bool = True
    use_lines: bool = True
    use_vps: bool = True
    use_imu: bool = True
    use_prior: bool = True
    use_relo: bool = True


def _imu_residuals(state, data, cfg, params):
    """[NF-1, 15] whitened IMU residuals from STORED preintegrations.

    Integration happened once at ingest; bias deviations are handled by the
    first-order correction inside imu.evaluate (imu_factor.h semantics) —
    nothing serial runs inside the optimizer's jacobians.
    """
    nf = cfg.nf

    def one(k):
        pre = jax.tree_util.tree_map(lambda a: a[k], data.imu_pre)
        r = imu_mod.evaluate(
            pre, params,
            state.p[k], state.q[k], state.v[k], state.ba[k], state.bg[k],
            state.p[k + 1], state.q[k + 1], state.v[k + 1], state.ba[k + 1],
            state.bg[k + 1],
        )
        return (data.imu_sqrt[k] @ r) * data.imu_valid[k]

    return jax.vmap(one)(jnp.arange(nf - 1))


def _point_residuals(state, data, inv_depth, cfg):
    """[MAXP, NF, 2] whitened+robust point residuals."""
    nf = cfg.nf
    dtype = state.p.dtype

    def one(slot, j):
        i = data.pt_start[slot]
        r = res.point_reprojection(
            state.p[i], state.q[i], state.p[j], state.q[j],
            state.p_ic, state.q_ic,
            inv_depth[slot], data.pt_obs[slot, i], data.pt_obs[slot, j],
        )
        valid = (
            (data.pt_id[slot] >= 0)
            & data.pt_mask[slot, j]
            & data.pt_solved[slot]
            & (j != i)
        )
        r = r * cfg.point_sqrt_info
        # kill NaN/Inf from padded slots BEFORE masking (NaN·0 = NaN, and the
        # where zeroes the tangent too)
        r = jnp.where(jnp.isfinite(r) & valid, r, 0.0)
        w = res.huber_weight(
            jax.lax.stop_gradient(jnp.sum(r * r)), cfg.huber_delta
        )
        return r * w

    return jax.vmap(
        lambda s: jax.vmap(lambda j: one(s, j))(jnp.arange(nf))
    )(jnp.arange(cfg.max_points))


def _line_residuals(state, data, orth, cfg):
    nf = cfg.nf
    dtype = state.p.dtype
    n_obs = jnp.sum(data.ln_mask, axis=1)

    def one(slot, j):
        r = res.line_reprojection(
            state.p[j], state.q[j], state.p_ic, state.q_ic,
            orth[slot], data.ln_obs[slot, j],
        )
        valid = (
            (data.ln_id[slot] >= 0)
            & data.ln_mask[slot, j]
            & data.ln_solved[slot]
            & (n_obs[slot] >= cfg.line_min_obs)
        )
        r = r * cfg.line_sqrt_info
        r = jnp.where(jnp.isfinite(r) & valid, r, 0.0)
        w = res.huber_weight(jax.lax.stop_gradient(jnp.sum(r * r)), cfg.huber_delta)
        return r * w

    return jax.vmap(
        lambda s: jax.vmap(lambda j: one(s, j))(jnp.arange(nf))
    )(jnp.arange(cfg.max_lines))


def _vp_residuals(state, data, orth, cfg):
    nf = cfg.nf
    dtype = state.p.dtype
    n_obs = jnp.sum(data.ln_mask, axis=1)

    def one(slot, j):
        r = res.vp_alignment(
            state.p[j], state.q[j], state.p_ic, state.q_ic,
            orth[slot], data.ln_vp[slot, j],
        )
        valid = (
            (data.ln_id[slot] >= 0)
            & data.ln_mask[slot, j]
            & data.ln_vp_mask[slot, j]
            & data.ln_solved[slot]
            & (n_obs[slot] >= cfg.line_min_obs)
        )
        r = r * cfg.vp_sqrt_info
        r = jnp.where(jnp.isfinite(r) & valid, r, 0.0)
        # reference adds vpProjectionFactor with the same Huber loss as the
        # point/line factors (estimator.cpp:1159-1165)
        w = res.huber_weight(jax.lax.stop_gradient(jnp.sum(r * r)), cfg.huber_delta)
        return r * w

    return jax.vmap(
        lambda s: jax.vmap(lambda j: one(s, j))(jnp.arange(nf))
    )(jnp.arange(cfg.max_lines))


def _relo_residuals(state, data, inv_depth, cfg):
    """[MAXP, 2] relocalization factors (estimator.cpp:1174-1206): each
    matched track's anchor observation re-projected into the relo (old
    keyframe) pose, against the loop-matched observation there.  Same
    unit-weight projection factor as the reference's ProjectionFactor on
    (pose[start], relo_pose, extrinsic, depth)."""

    def one(slot):
        i = data.pt_start[slot]
        r = res.point_reprojection(
            state.p[i], state.q[i], state.p_relo, state.q_relo,
            state.p_ic, state.q_ic,
            inv_depth[slot], data.pt_obs[slot, i], data.relo_obs[slot],
        )
        valid = (
            data.relo_valid
            & data.relo_mask[slot]
            & (data.pt_id[slot] >= 0)
            & data.pt_solved[slot]
        )
        r = r * cfg.point_sqrt_info
        r = jnp.where(jnp.isfinite(r) & valid, r, 0.0)
        w = res.huber_weight(
            jax.lax.stop_gradient(jnp.sum(r * r)), cfg.huber_delta
        )
        return r * w

    return jax.vmap(one)(jnp.arange(cfg.max_points))


def window_residuals(
    x, data: TrackData, cfg: WindowConfig, params: imu_mod.ImuParams,
    weights: ResidualWeights = ResidualWeights(),
):
    """Full whitened residual stack. x = (WindowState, inv_depth, orth)."""
    state, inv_depth, orth = x
    parts = []
    if weights.use_prior:
        dx = boxminus_state(state, data.prior_state, cfg)
        parts.append(marg_mod.prior_residual(data.prior, dx))
    if weights.use_imu:
        parts.append(_imu_residuals(state, data, cfg, params).reshape(-1))
    if weights.use_points:
        parts.append(_point_residuals(state, data, inv_depth, cfg).reshape(-1))
    if weights.use_lines:
        parts.append(_line_residuals(state, data, orth, cfg).reshape(-1))
    if weights.use_vps:
        parts.append(_vp_residuals(state, data, orth, cfg).reshape(-1))
    if weights.use_relo:
        parts.append(_relo_residuals(state, data, inv_depth, cfg).reshape(-1))
    return jnp.concatenate(parts)


def retract_all(x, delta, cfg: WindowConfig):
    state, inv_depth, orth = x
    nd = cfg.nd
    P = cfg.max_points
    state_new = retract_state(state, delta[:nd], cfg)
    invd_new = inv_depth + delta[nd : nd + P]
    orth_new = jax.vmap(orth_boxplus)(orth, delta[nd + P :].reshape(-1, 4))
    return state_new, invd_new, orth_new


# ---------------------------------------------------------------------------
# BA solve + gauge fix
# ---------------------------------------------------------------------------


def solve_window(
    state: WindowState,
    data: TrackData,
    cfg: WindowConfig,
    params: imu_mod.ImuParams,
    weights: ResidualWeights = ResidualWeights(),
    num_iters: int | None = None,
):
    """Sliding-window BA (optimizationwithLine:1043-1215) + yaw/position gauge
    re-anchoring (double2vector2:810-900).

    Uses the structured window linearizer (lm_solve_window): nd+5 jvps and
    block normal equations, so the solve scales LINEARLY with the landmark
    population — the mapping profile's 1024-point windows cost ~the same
    per-iteration dense work as the 128-point realtime profile."""
    x0 = (state, data.pt_inv_depth, data.ln_orth)
    layout = lm_mod.WindowLayout(
        nd=cfg.nd, nf=cfg.nf, P=cfg.max_points, L=cfg.max_lines,
        has_prior=weights.use_prior, has_imu=weights.use_imu,
        has_points=weights.use_points, has_lines=weights.use_lines,
        has_vps=weights.use_vps, has_relo=weights.use_relo,
    )
    out = lm_mod.lm_solve_window(
        lambda x: window_residuals(x, data, cfg, params, weights),
        lambda x, d: retract_all(x, d, cfg),
        x0,
        layout,
        lm_mod.LMConfig(num_iters=num_iters or cfg.ba_iters),
    )
    state_new, invd_new, orth_new = out.x
    state_fixed, orth_fixed = gauge_fix(state, state_new, orth_new, data.ln_solved, cfg)
    data_new = data._replace(pt_inv_depth=invd_new, ln_orth=orth_fixed)
    return state_fixed, data_new, out


def gauge_fix(state, state_new, orth_new, ln_solved, cfg: WindowConfig):
    """Restore frame-0 position and yaw after a solve (double2vector2
    semantics), applying the same rigid correction to the relo pose and all
    solved world lines.  Shared by the single-chip and distributed solvers."""
    ypr0_old = rot_to_ypr(quat_to_rot(state.q[0]))
    ypr0_new = rot_to_ypr(quat_to_rot(state_new.q[0]))
    dyaw = ypr0_old[0] - ypr0_new[0]
    z = jnp.zeros_like(dyaw)
    R_fix = ypr_to_rot(jnp.stack([dyaw, z, z]))
    q_fix = rot_to_quat(R_fix)

    p_fixed = (
        jax.vmap(lambda p: R_fix @ (p - state_new.p[0]))(state_new.p) + state.p[0]
    )
    q_fixed = jax.vmap(lambda q: quat_mul(q_fix, q))(state_new.q)
    v_fixed = jax.vmap(lambda v: R_fix @ v)(state_new.v)
    state_fixed = state_new._replace(
        p=p_fixed,
        q=q_fixed,
        v=v_fixed,
        # relo pose rides the same gauge correction so the relative pose
        # against the window stays consistent (double2vector relo section)
        p_relo=R_fix @ (state_new.p_relo - state_new.p[0]) + state.p[0],
        q_relo=quat_mul(q_fix, state_new.q_relo),
    )

    # transform world lines by the same gauge correction
    t_fix = state.p[0] - R_fix @ state_new.p[0]

    def fix_line(orth):
        plk = orth_to_plk(orth)
        # world' = R_fix * world + t_fix  =>  plücker transform with (R_fix, t_fix)
        return plk_to_orth(plk_transform(plk, R_fix, t_fix))

    orth_fixed = jnp.where(
        ln_solved[:, None], jax.vmap(fix_line)(orth_new), orth_new
    )
    return state_fixed, orth_fixed


# ---------------------------------------------------------------------------
# triangulation (points: SVD over track; lines: best plane pair)
# ---------------------------------------------------------------------------


def triangulate_points(state: WindowState, data: TrackData, cfg: WindowConfig):
    """Initialize depths of unsolved tracks (feature_manager.cpp:565-621)."""
    nf = cfg.nf
    # camera poses: world -> camera
    q_wc = jax.vmap(lambda q: quat_mul(q, state.q_ic))(state.q)
    p_wc = state.p + jax.vmap(lambda q: quat_rotate(q, state.p_ic))(state.q)
    R_cw = jax.vmap(lambda q: quat_to_rot(quat_conj(q)))(q_wc)
    t_cw = jax.vmap(lambda R, p: -R @ p)(R_cw, p_wc)

    from ..ops.mvg import triangulate_tracks

    X_w, ok2 = triangulate_tracks(R_cw, t_cw, data.pt_obs[:, :, 0:2], data.pt_mask)

    def depth_in_anchor(slot):
        i = data.pt_start[slot]
        Xc = quat_rotate(quat_conj(q_wc[i]), X_w[slot] - p_wc[i])
        return Xc[2]

    z_anchor = jax.vmap(depth_in_anchor)(jnp.arange(cfg.max_points))
    n_obs = jnp.sum(data.pt_mask, axis=1)
    new_ok = (
        (data.pt_id >= 0) & ~data.pt_solved & (n_obs >= 2) & (z_anchor > 0.1) & ok2
    )
    invd = jnp.where(new_ok, 1.0 / jnp.clip(z_anchor, 0.1, 1e3), data.pt_inv_depth)
    return data._replace(
        pt_inv_depth=invd, pt_solved=data.pt_solved | new_ok
    )


def triangulate_lines(state: WindowState, data: TrackData, cfg: WindowConfig):
    """Initialize world Plücker lines from the observation pair with the widest
    plane angle (feature_manager.cpp triangulateLine:413-563)."""
    nf = cfg.nf
    q_wc = jax.vmap(lambda q: quat_mul(q, state.q_ic))(state.q)
    p_wc = state.p + jax.vmap(lambda q: quat_rotate(q, state.p_ic))(state.q)
    dtype = state.p.dtype

    def one(slot):
        # anchor = first observed frame
        first = jnp.argmax(data.ln_mask[slot])
        obs_i = data.ln_obs[slot, first]
        # plane through camera center i and the two endpoints (camera frame)
        pii = pi_from_ppp(
            jnp.array([0.0, 0.0, 0.0], dtype),
            jnp.concatenate([obs_i[0:2], jnp.ones(1, dtype)]),
            jnp.concatenate([obs_i[2:4], jnp.ones(1, dtype)]),
        )

        def plane_j(j):
            obs_j = data.ln_obs[slot, j]
            # endpoints of frame-j obs expressed in frame i
            q_ij = quat_mul(quat_conj(q_wc[first]), q_wc[j])
            t_ij = quat_rotate(quat_conj(q_wc[first]), p_wc[j] - p_wc[first])
            a = quat_rotate(q_ij, jnp.concatenate([obs_j[0:2], jnp.ones(1, dtype)])) + t_ij
            b = quat_rotate(q_ij, jnp.concatenate([obs_j[2:4], jnp.ones(1, dtype)])) + t_ij
            return pi_from_ppp(t_ij, a, b)

        pjs = jax.vmap(plane_j)(jnp.arange(nf))
        # pick max-angle plane: |cos| between normals smallest
        ni = pii[0:3] / jnp.linalg.norm(pii[0:3])
        njs = pjs[:, 0:3] / jnp.linalg.norm(pjs[:, 0:3], axis=-1, keepdims=True)
        cosang = jnp.abs(njs @ ni)
        cosang = jnp.where(
            data.ln_mask[slot] & (jnp.arange(nf) != first), cosang, 2.0
        )
        best = jnp.argmin(cosang)
        plk_i = pipi_plk(pii, pjs[best])
        # to world
        R_wc_i = quat_to_rot(q_wc[first])
        plk_w = plk_transform_inv(plk_i, R_wc_i.T, -R_wc_i.T @ p_wc[first])
        good = cosang[best] < 0.998  # reference cos θ gate (:538)
        return plk_to_orth(plk_w), good

    orth_new, good = jax.vmap(one)(jnp.arange(cfg.max_lines))
    n_obs = jnp.sum(data.ln_mask, axis=1)
    new_ok = (data.ln_id >= 0) & ~data.ln_solved & (n_obs >= cfg.line_min_obs) & good
    orth = jnp.where(new_ok[:, None], orth_new, data.ln_orth)
    return data._replace(ln_orth=orth, ln_solved=data.ln_solved | new_ok)


# ---------------------------------------------------------------------------
# line-only settle pass (onlyLineOpt)
# ---------------------------------------------------------------------------


def settle_lines(state: WindowState, data: TrackData, cfg: WindowConfig,
                 num_iters: int = 8):
    """Line-only optimization with poses and extrinsics FIXED, Cauchy(1.0)
    loss — the reference's ``onlyLineOpt`` (estimator.cpp:950-1042), run
    right after line triangulation and BEFORE the joint BA so that freshly
    triangulated (noisy) Plücker lines settle against all their observations
    instead of dragging the poses.

    With poses fixed the problem block-diagonalizes per line, so instead of
    one ceres problem this is a batched [MAXL] damped Gauss-Newton on the
    4-dof orthonormal coords (tiny 4x4 solves, vmapped — pure MXU/VPU work).
    """
    nf = cfg.nf
    dtype = state.p.dtype
    n_obs = jnp.sum(data.ln_mask, axis=1)
    active = (data.ln_id >= 0) & data.ln_solved & (n_obs >= cfg.line_min_obs)

    def line_resid(orth, slot):
        def per_frame(j):
            r = res.line_reprojection(
                state.p[j], state.q[j], state.p_ic, state.q_ic,
                orth, data.ln_obs[slot, j],
            ) * cfg.line_sqrt_info
            r = jnp.where(jnp.isfinite(r) & data.ln_mask[slot, j], r, 0.0)
            w = res.cauchy_weight(jax.lax.stop_gradient(jnp.sum(r * r)), 1.0)
            return r * w

        return jax.vmap(per_frame)(jnp.arange(nf)).reshape(-1)

    def solve_one(orth0, slot):
        def it(_, orth):
            f = lambda d: line_resid(orth_boxplus(orth, d), slot)
            d0 = jnp.zeros(4, dtype)
            J = jax.jacfwd(f)(d0)
            r = f(d0)
            H = J.T @ J
            H = H + 1e-3 * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(4, dtype=dtype)
            g = J.T @ r
            d = -jnp.linalg.solve(H, g)
            d = jnp.where(jnp.isfinite(d), d, 0.0)
            new = orth_boxplus(orth, d)
            c0 = jnp.sum(r * r)
            c1 = jnp.sum(line_resid(new, slot) ** 2)
            return jnp.where(c1 < c0, new, orth)

        return jax.lax.fori_loop(0, num_iters, it, orth0)

    orth_new = jax.vmap(solve_one)(data.ln_orth, jnp.arange(cfg.max_lines))
    orth = jnp.where(active[:, None], orth_new, data.ln_orth)
    return data._replace(ln_orth=orth)


# ---------------------------------------------------------------------------
# outlier rejection
# ---------------------------------------------------------------------------


def _line_endpoint_gates(state, data, cfg):
    """The reference's geometric line culls (removeLineOutlier:702-798
    beyond the residual gate): trim the infinite line by the anchor-frame
    observation and drop lines whose 3D endpoints land behind the camera
    (e.z < 0) or spread over > 10 m."""
    nf = cfg.nf
    dtype = state.p.dtype
    q_wc = jax.vmap(lambda q: quat_mul(q, state.q_ic))(state.q)
    p_wc = state.p + jax.vmap(lambda q: quat_rotate(q, state.p_ic))(state.q)

    def one(slot):
        i = jnp.argmax(data.ln_mask[slot])
        # world Plücker -> anchor camera frame
        R_cw = quat_to_rot(quat_conj(q_wc[i]))
        t_cw = -R_cw @ p_wc[i]
        plk_c = plk_transform(orth_to_plk(data.ln_orth[slot]), R_cw, t_cw)
        nc, vc = plk_c[0:3], plk_c[3:6]
        # dual Plücker matrix Lc
        sk = jnp.array(
            [[0.0, -nc[2], nc[1]], [nc[2], 0.0, -nc[0]], [-nc[1], nc[0], 0.0]],
            dtype,
        )
        Lc = jnp.zeros((4, 4), dtype)
        Lc = Lc.at[0:3, 0:3].set(sk).at[0:3, 3].set(vc).at[3, 0:3].set(-vc)
        obs = data.ln_obs[slot, i]
        p11 = jnp.concatenate([obs[0:2], jnp.ones(1, dtype)])
        p21 = jnp.concatenate([obs[2:4], jnp.ones(1, dtype)])
        ln = jnp.cross(p11, p21)[0:2]
        ln = ln / jnp.maximum(jnp.linalg.norm(ln), 1e-12)
        p12 = p11 + jnp.concatenate([ln, jnp.zeros(1, dtype)])
        p22 = p21 + jnp.concatenate([ln, jnp.zeros(1, dtype)])
        zero = jnp.zeros(3, dtype)
        pi1 = pi_from_ppp(zero, p11, p12)
        pi2 = pi_from_ppp(zero, p21, p22)
        e1 = Lc @ pi1
        e2 = Lc @ pi2
        e1 = e1 / jnp.where(jnp.abs(e1[3]) > 1e-12, e1[3], 1e-12)
        e2 = e2 / jnp.where(jnp.abs(e2[3]) > 1e-12, e2[3], 1e-12)
        bad = (e1[2] < 0) | (e2[2] < 0) | (
            jnp.linalg.norm(e1[0:3] - e2[0:3]) > 10.0
        )
        return bad | ~jnp.all(jnp.isfinite(e1)) | ~jnp.all(jnp.isfinite(e2))

    return jax.vmap(one)(jnp.arange(cfg.max_lines))


def reject_outliers(state, data, cfg, reproj_thresh=5.0 / 460.0, line_thresh=3.0 / 500.0,
                    cull_points=True):
    """Drop tracks with negative depth or large mean reprojection error
    (estimator removeFailures + feature_manager removeLineOutlier:702-798:
    max per-obs line error, endpoint-behind-camera, endpoint spread > 10).

    cull_points=False restricts the pass to lines — the pre-solve call
    mirrors the reference's removeLineOutlier-only placement (points are
    culled after the joint solve, not before), and skips the point residual
    stack in that program."""
    if cull_points:
        r_pt = _point_residuals(state, data, data.pt_inv_depth, cfg) / cfg.point_sqrt_info
        err = jnp.linalg.norm(r_pt, axis=-1)  # [MAXP, NF]
        n = jnp.maximum(jnp.sum(data.pt_mask, axis=1) - 1, 1)
        mean_err = jnp.sum(err, axis=1) / n
        bad_pt = data.pt_solved & (
            (data.pt_inv_depth < 0) | (mean_err > reproj_thresh)
        )
    else:
        bad_pt = jnp.zeros_like(data.pt_solved)
    r_ln = _line_residuals(state, data, data.ln_orth, cfg) / cfg.line_sqrt_info
    err_l = jnp.max(jnp.linalg.norm(r_ln, axis=-1), axis=1)
    bad_geom = _line_endpoint_gates(state, data, cfg)
    bad_ln = data.ln_solved & ((err_l > line_thresh) | bad_geom)
    return data._replace(
        pt_id=jnp.where(bad_pt, -1, data.pt_id),
        pt_solved=data.pt_solved & ~bad_pt,
        pt_mask=data.pt_mask & ~bad_pt[:, None],
        ln_id=jnp.where(bad_ln, -1, data.ln_id),
        ln_solved=data.ln_solved & ~bad_ln,
        ln_mask=data.ln_mask & ~bad_ln[:, None],
    )
