"""Track ingest, keyframe decision, marginalization and window slide.

TPU-native re-design of ``vins_estimator/src/feature_manager.cpp``
(addFeatureCheckParallax:106-188, removeBackShiftDepth:800, removeBack:877,
removeFront:915) and ``estimator.cpp`` (slideWindow:1731-1846,
marginalization :1229-1447): all bookkeeping is masked gathers/scatters over
fixed-capacity SoA tables — no reallocation, jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import imu as imu_mod
from ..solver import marginalization as marg_mod
from ..utils.geometry import quat_conj, quat_mul, quat_rotate
from .window import (
    ResidualWeights,
    TrackData,
    WindowConfig,
    WindowState,
    retract_all,
    window_residuals,
)


# ---------------------------------------------------------------------------
# ingest
# ---------------------------------------------------------------------------


def _assign_slots(table_ids, in_ids):
    """Match incoming ids to table slots; allocate free slots for new ids.

    Returns slot index per incoming item (-1 if table full) and the updated
    table id array.  Vectorized replacement for the reference's per-feature
    list search (feature_manager.cpp:114-164).
    """
    P = table_ids.shape[0]
    M = in_ids.shape[0]
    valid_in = in_ids >= 0

    eq = (in_ids[:, None] == table_ids[None, :]) & valid_in[:, None]
    matched = jnp.any(eq, axis=1)
    match_slot = jnp.argmax(eq, axis=1)

    # allocate free slots (table_ids < 0) to unmatched incoming, in order
    free = table_ids < 0
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank of each free slot
    need = valid_in & ~matched
    need_rank = jnp.cumsum(need.astype(jnp.int32)) - 1  # rank of each new id
    n_free = jnp.sum(free.astype(jnp.int32))

    # slot whose free_rank == need_rank[m]
    free_slot_of_rank = jnp.argmax(
        (free_rank[None, :] == need_rank[:, None]) & free[None, :], axis=1
    )
    can_alloc = need & (need_rank < n_free)
    slots = jnp.where(matched, match_slot, jnp.where(can_alloc, free_slot_of_rank, -1))

    # slot-centric update (no duplicate-index scatter): each slot gathers its
    # (unique) incoming item, if any
    assigned = (slots[:, None] == jnp.arange(P)[None, :]) & (slots >= 0)[:, None]
    has = jnp.any(assigned, axis=0)  # [P]
    src = jnp.argmax(assigned, axis=0)  # [P] incoming index per slot
    new_ids = jnp.where(has, in_ids[src], table_ids)
    return slots, new_ids, has, src


def ingest_frame(
    data: TrackData,
    cfg: WindowConfig,
    frame_idx,
    pt_ids,
    pt_rays,
    ln_ids=None,
    ln_obs=None,
    ln_vps=None,
    ln_vp_valid=None,
):
    """Insert one frame's observations at window slot ``frame_idx``.

    pt_ids: [M] int32 (-1 pad); pt_rays: [M, 3] normalized rays.
    ln_*: optional line channel (ids, [Ml,4] endpoints, [Ml,3] VPs, [Ml] flags).
    """
    slots, new_pt_ids, has, src = _assign_slots(data.pt_id, pt_ids)

    pt_obs = data.pt_obs.at[:, frame_idx].set(
        jnp.where(has[:, None], pt_rays[src], data.pt_obs[:, frame_idx])
    )
    pt_mask = data.pt_mask.at[:, frame_idx].set(data.pt_mask[:, frame_idx] | has)
    # newly allocated slot: its stored id changed
    newly = has & (data.pt_id != new_pt_ids)
    pt_start = jnp.where(newly, frame_idx, data.pt_start)
    pt_solved = jnp.where(newly, False, data.pt_solved)
    data = data._replace(
        pt_id=new_pt_ids, pt_obs=pt_obs, pt_mask=pt_mask,
        pt_start=pt_start, pt_solved=pt_solved,
    )

    if ln_ids is not None:
        lslots, new_ln_ids, lhas, lsrc = _assign_slots(data.ln_id, ln_ids)
        ln_obs_t = data.ln_obs.at[:, frame_idx].set(
            jnp.where(lhas[:, None], ln_obs[lsrc], data.ln_obs[:, frame_idx])
        )
        ln_mask_t = data.ln_mask.at[:, frame_idx].set(
            data.ln_mask[:, frame_idx] | lhas
        )
        lnew = lhas & (data.ln_id != new_ln_ids)
        ln_solved = jnp.where(lnew, False, data.ln_solved)
        if ln_vps is not None:
            ln_vp_t = data.ln_vp.at[:, frame_idx].set(
                jnp.where(lhas[:, None], ln_vps[lsrc], data.ln_vp[:, frame_idx])
            )
            ln_vpm_t = data.ln_vp_mask.at[:, frame_idx].set(
                jnp.where(lhas, ln_vp_valid[lsrc], data.ln_vp_mask[:, frame_idx])
            )
        else:
            ln_vp_t, ln_vpm_t = data.ln_vp, data.ln_vp_mask
        data = data._replace(
            ln_id=new_ln_ids, ln_obs=ln_obs_t, ln_mask=ln_mask_t,
            ln_vp=ln_vp_t, ln_vp_mask=ln_vpm_t, ln_solved=ln_solved,
        )
    return data


def set_imu_interval(data: TrackData, k, dts, accs, gyrs, mask,
                     ba=None, bg=None, params=None):
    """Store the (padded) IMU batch for interval k -> k+1 and preintegrate it
    once at the current bias estimate (integration never happens inside the
    optimizer afterwards)."""
    data = data._replace(
        imu_dt=data.imu_dt.at[k].set(dts),
        imu_acc=data.imu_acc.at[k].set(accs),
        imu_gyr=data.imu_gyr.at[k].set(gyrs),
        imu_mask=data.imu_mask.at[k].set(mask.astype(bool)),
        imu_valid=data.imu_valid.at[k].set(True),
    )
    if params is not None:
        z3 = jnp.zeros(3, dts.dtype)
        pre = imu_mod.preintegrate(
            dts, accs, gyrs, mask,
            z3 if ba is None else ba, z3 if bg is None else bg, params,
        )
        data = data._replace(
            imu_pre=jax.tree_util.tree_map(
                lambda buf, v: buf.at[k].set(v), data.imu_pre, pre
            ),
            imu_sqrt=data.imu_sqrt.at[k].set(imu_mod.sqrt_information(pre)),
        )
    return data


def repropagate_all(data: TrackData, state, params):
    """Re-preintegrate every stored interval at the current per-frame biases
    (IntegrationBase::repropagate parity; used after initialization resets
    the gyro bias)."""
    nf1 = data.imu_dt.shape[0]

    def one(k):
        return imu_mod.preintegrate(
            data.imu_dt[k], data.imu_acc[k], data.imu_gyr[k], data.imu_mask[k],
            state.ba[k], state.bg[k], params,
        )

    pre = jax.vmap(one)(jnp.arange(nf1))
    sqrt = jax.vmap(imu_mod.sqrt_information)(pre)
    return data._replace(imu_pre=pre, imu_sqrt=sqrt)


def keyframe_parallax(data: TrackData, cfg: WindowConfig, frame_idx):
    """Mean parallax between frames frame_idx-2 and frame_idx-1 over tracks
    observed in both (addFeatureCheckParallax:166-188).  Returns
    (is_keyframe, parallax, n_tracked_in_new)."""
    f2 = frame_idx - 2
    f1 = frame_idx - 1
    co = data.pt_mask[:, f2] & data.pt_mask[:, f1] & (data.pt_id >= 0)
    d = jnp.linalg.norm(
        data.pt_obs[:, f2, 0:2] - data.pt_obs[:, f1, 0:2], axis=-1
    )
    n = jnp.sum(co.astype(jnp.int32))
    parallax = jnp.sum(d * co) / jnp.maximum(n, 1)
    n_new = jnp.sum((data.pt_mask[:, frame_idx] & (data.pt_id >= 0)).astype(jnp.int32))
    is_kf = (n < 20) | (parallax >= cfg.min_parallax)
    return is_kf, parallax, n_new


# ---------------------------------------------------------------------------
# marginalization of the oldest frame
# ---------------------------------------------------------------------------


def gauge_nullspace(state: WindowState, cfg: WindowConfig):
    """[nd, 4] basis of the window's unobservable (gauge) directions at the
    linearization point: global translation (3 cols) and rotation about
    gravity (yaw).  In the delta layout of retract_state: p += δp,
    q ← q·exp(δθ) (body-frame), v += δv — a global yaw rotation by α is
    δp_k = α ẑ×p_k, δθ_k = α R_kᵀẑ, δv_k = α ẑ×v_k.  Extrinsic and relo
    dims are observable (zero rows)."""
    nf, nd = cfg.nf, cfg.nd
    dtype = state.p.dtype
    z = jnp.array([0.0, 0.0, 1.0], dtype)
    Nb = jnp.zeros((nd, 4), dtype)
    rows = jnp.arange(nf) * 15
    for t in range(3):
        Nb = Nb.at[rows + t, t].set(1.0)
    dp = jnp.cross(jnp.broadcast_to(z, (nf, 3)), state.p)
    dth = jax.vmap(lambda q: quat_rotate(quat_conj(q), z))(state.q)
    dv = jnp.cross(jnp.broadcast_to(z, (nf, 3)), state.v)
    for c, vals in ((0, dp), (3, dth), (6, dv)):
        for j in range(3):
            Nb = Nb.at[rows + c + j, 3].set(vals[:, j])
    return Nb


def _absorbed_points(data: TrackData):
    """Point tracks whose full information is folded into the prior by
    marginalize_old — the SAME predicate drives the marginalization mask and
    (when cfg.retire_points) the post-slide retirement, so the two sets can
    never drift apart (r4 advisor finding)."""
    return (data.pt_start == 0) & (data.pt_id >= 0) & data.pt_solved


def _absorbed_lines(data: TrackData, cfg: WindowConfig):
    """Lines whose factors are folded into the prior.  Includes the
    line_min_obs gate explicitly (matching _line_residuals' activation gate)
    rather than relying on the residual stack to zero sub-threshold rows."""
    first_obs = jnp.argmax(data.ln_mask, axis=1)
    n_obs = jnp.sum(data.ln_mask, axis=1)
    return (
        (first_obs == 0) & (data.ln_id >= 0) & data.ln_solved
        & (n_obs >= cfg.line_min_obs)
    )


def marginalize_old(
    state: WindowState, data: TrackData, cfg: WindowConfig, params: imu_mod.ImuParams
) -> marg_mod.Prior:
    """Build the square-root prior from all factors touching frame 0
    (estimator.cpp:1229-1345): previous prior + IMU(0,1) + point factors
    anchored at frame 0 + line factors of lines first seen at frame 0."""
    # restrict the factor population via masks
    anchored = _absorbed_points(data)
    pt_mask_r = data.pt_mask & anchored[:, None]

    if cfg.marg_lines:
        ln_anchored = _absorbed_lines(data, cfg)
        ln_mask_r = data.ln_mask & ln_anchored[:, None]
        # reference skips the j==0 line factor (drop_set, estimator.cpp:1327)
        ln_mask_r = ln_mask_r.at[:, 0].set(False)
    else:
        # live-only lines: their factors never enter the prior, so the live
        # window counts each observation exactly once (see WindowConfig)
        ln_mask_r = jnp.zeros_like(data.ln_mask)

    imu_valid_r = jnp.zeros_like(data.imu_valid).at[0].set(data.imu_valid[0])

    data_r = data._replace(
        pt_mask=pt_mask_r, ln_mask=ln_mask_r, imu_valid=imu_valid_r
    )
    # relo factors are never marginalized into the prior (the reference does
    # not add them to marginalization_info — estimator.cpp:1229-1345)
    weights = ResidualWeights(use_vps=False, use_relo=False)

    x0 = (state, data.pt_inv_depth, data.ln_orth)
    N = cfg.n_total
    dtype = state.p.dtype
    zero = jnp.zeros(N, dtype)

    def r_of(d):
        return window_residuals(
            retract_all(x0, d, cfg), data_r, cfg, params, weights
        )

    r0 = r_of(zero)
    J = jax.jacfwd(r_of)(zero)

    # eliminate frame-0 dims + every landmark dim via the structured fast
    # path (arrow factorization; see marginalize_window — also fixes the
    # r02 √-prior row-order truncation under the [:nd] crop below)
    Jp_full, rp_full = marg_mod.marginalize_window(
        J, r0, cfg.nd, dense_start=0, dense_size=15,
        n_points=cfg.max_points, n_lines=cfg.max_lines,
    )
    nd = cfg.nd
    # prior lives on the dense block only (landmark columns are exactly zero)
    Jp = Jp_full[:nd, :nd]
    rp = rp_full[:nd]
    # remove spurious f32 gauge stiffness exactly (see project_out_nullspace)
    Jp = marg_mod.project_out_nullspace(Jp, gauge_nullspace(state, cfg))
    # χ²-capped prior: when the marginalized factor set is inconsistent at
    # its own linearization point (mean whitened square ms over the active
    # non-prior rows ≫ the clean-data level), its linearization errors are
    # the same order as its information — baking it in at full strength
    # locks those errors into every future window.  Scale the √-prior by
    # α = min(1, m0/ms): identity on clean windows, information ∝ 1/ms²
    # beyond (r04 sweep: n1-noise ATE 0.61 → 0.15 with n0/n0.5 unchanged).
    # The reference has no equivalent (ceres f64 + double-counted prior);
    # this is a robustness improvement, not a parity feature.
    r_vis = r0[nd:]  # IMU + point + line rows (prior rows are the first nd)
    # energy-weighted mean square Σr⁴/Σr² (not a plain mean over nonzero
    # rows): robust to populations of near-zero rows — e.g. line factors,
    # whose fit-statistics noise is ~5x below the point noise, would
    # otherwise dilute ms and silently disable the temper when lines are on
    r2 = r_vis * r_vis
    ms = jnp.sum(r2 * r2) / jnp.maximum(jnp.sum(r2), 1e-12)
    alpha = jnp.minimum(1.0, cfg.prior_chi2_cap / jnp.maximum(ms, 1e-9))
    return marg_mod.Prior(J=Jp * alpha, r0=rp * alpha, valid=jnp.asarray(True))


def _shift_frames(arr, nf):
    """[NF, ...] -> shifted left by one; last entry duplicated."""
    return jnp.concatenate([arr[1:], arr[-1:]], axis=0)


def slide_window_old(
    state: WindowState,
    data: TrackData,
    cfg: WindowConfig,
    params: imu_mod.ImuParams,
    new_prior: marg_mod.Prior,
):
    """Drop frame 0 after marginalization (slideWindow MARGIN_OLD:1731-1790
    + removeBackShiftDepth:800): shift states/buffers left, re-anchor depths
    of frame-0 features to the new frame 0, drop dead tracks, permute prior
    columns."""
    nf = cfg.nf

    # --- consistent marginalization: retire absorbed tracks ----------------
    # marginalize_old just folded every solved frame-0-anchored track (and
    # line) into the prior over ALL its observations.  The reference then
    # re-anchors those features and re-adds their factors to every later BA
    # (removeBackShiftDepth:800) — counting frames-1..N information TWICE
    # (once inside the prior, once live), a known VINS-Mono inconsistency
    # that is tolerable at ceres-f64 but measured here to dominate the
    # noise-scaling of ATE (r04: 0.5 px 0.18→0.06, 0 px 0.034→0.016 when
    # absorbed tracks retire instead).  A retired id re-enters as a fresh
    # track on its next detection, so only future observations are lost
    # from the live window — and those arrive with the new track.
    absorbed_pt = _absorbed_points(data) if cfg.retire_points else (
        jnp.zeros_like(data.pt_solved)
    )
    # retirement only makes sense for lines whose info WAS absorbed
    absorbed_ln = (
        _absorbed_lines(data, cfg)
        if (cfg.retire_lines and cfg.marg_lines)
        else jnp.zeros_like(data.ln_solved)
    )
    data = data._replace(
        pt_id=jnp.where(absorbed_pt, -1, data.pt_id),
        pt_mask=data.pt_mask & ~absorbed_pt[:, None],
        pt_solved=data.pt_solved & ~absorbed_pt,
        ln_id=jnp.where(absorbed_ln, -1, data.ln_id),
        ln_mask=data.ln_mask & ~absorbed_ln[:, None],
        ln_solved=data.ln_solved & ~absorbed_ln,
    )

    # --- re-anchor frame-0 point depths to (old) frame 1 ------------------
    q_wc = jax.vmap(lambda q: quat_mul(q, state.q_ic))(state.q)
    p_wc = state.p + jax.vmap(lambda q: quat_rotate(q, state.p_ic))(state.q)

    def reanchor(slot):
        ray0 = data.pt_obs[slot, 0]
        z0 = 1.0 / jnp.clip(data.pt_inv_depth[slot], 1e-4, 1e4)
        X_w = quat_rotate(q_wc[0], ray0 * z0) + p_wc[0]
        Xc1 = quat_rotate(quat_conj(q_wc[1]), X_w - p_wc[1])
        return Xc1[2]

    z1 = jax.vmap(reanchor)(jnp.arange(cfg.max_points))
    was_anchor0 = (data.pt_start == 0) & (data.pt_id >= 0)
    # tracks observed only in frame 0 die; others re-anchor
    n_obs_rest = jnp.sum(data.pt_mask[:, 1:], axis=1)
    keep_pt = (data.pt_id >= 0) & (n_obs_rest >= 1)
    good_depth = z1 > 0.1
    inv_depth_new = jnp.where(
        was_anchor0 & data.pt_solved & good_depth,
        1.0 / jnp.clip(z1, 0.1, 1e4),
        data.pt_inv_depth,
    )
    solved_new = jnp.where(
        was_anchor0, data.pt_solved & good_depth, data.pt_solved
    )

    pt_start_new = jnp.where(
        was_anchor0, 0, jnp.maximum(data.pt_start - 1, 0)
    ).astype(data.pt_start.dtype)
    # but if the old anchor-0 track isn't observed at old frame 1, its new
    # anchor becomes its first remaining observation
    # index dtype pinned to the table's int32 (argmax yields int64 under
    # x64, which would flip pt_start's dtype on the keyframe branch only
    # and break lax.cond's branch-type equality)
    first_rest = jnp.argmax(data.pt_mask[:, 1:], axis=1).astype(data.pt_start.dtype)
    pt_start_new = jnp.where(
        was_anchor0 & ~data.pt_mask[:, 1], first_rest, pt_start_new
    )
    solved_new = jnp.where(
        was_anchor0 & ~data.pt_mask[:, 1], jnp.zeros_like(solved_new), solved_new
    )

    keep_ln = (data.ln_id >= 0) & (jnp.sum(data.ln_mask[:, 1:], axis=1) >= 1)

    data_new = data._replace(
        pt_id=jnp.where(keep_pt, data.pt_id, -1),
        pt_obs=jnp.concatenate([data.pt_obs[:, 1:], data.pt_obs[:, -1:]], axis=1),
        pt_mask=jnp.concatenate(
            [data.pt_mask[:, 1:], jnp.zeros_like(data.pt_mask[:, -1:])], axis=1
        )
        & keep_pt[:, None],
        pt_start=pt_start_new,
        pt_inv_depth=inv_depth_new,
        pt_solved=solved_new & keep_pt,
        ln_id=jnp.where(keep_ln, data.ln_id, -1),
        ln_obs=jnp.concatenate([data.ln_obs[:, 1:], data.ln_obs[:, -1:]], axis=1),
        ln_mask=jnp.concatenate(
            [data.ln_mask[:, 1:], jnp.zeros_like(data.ln_mask[:, -1:])], axis=1
        )
        & keep_ln[:, None],
        ln_vp=jnp.concatenate([data.ln_vp[:, 1:], data.ln_vp[:, -1:]], axis=1),
        ln_vp_mask=jnp.concatenate(
            [data.ln_vp_mask[:, 1:], jnp.zeros_like(data.ln_vp_mask[:, -1:])], axis=1
        )
        & keep_ln[:, None],
        ln_solved=data.ln_solved & keep_ln,
        imu_dt=_shift_frames(data.imu_dt, nf - 1).at[-1].set(0.0),
        imu_acc=_shift_frames(data.imu_acc, nf - 1),
        imu_gyr=_shift_frames(data.imu_gyr, nf - 1),
        imu_mask=_shift_frames(data.imu_mask, nf - 1).at[-1].set(False),
        imu_valid=_shift_frames(data.imu_valid, nf - 1).at[-1].set(False),
        imu_pre=jax.tree_util.tree_map(
            lambda a: _shift_frames(a, nf - 1), data.imu_pre
        ),
        imu_sqrt=_shift_frames(data.imu_sqrt, nf - 1),
        # relocalization info is consumed by exactly one solve
        relo_mask=jnp.zeros_like(data.relo_mask),
        relo_valid=jnp.asarray(False),
        frame_t=_shift_frames(data.frame_t, nf),
    )

    # --- states shift ------------------------------------------------------
    state_new = state._replace(
        p=_shift_frames(state.p, nf),
        q=_shift_frames(state.q, nf),
        v=_shift_frames(state.v, nf),
        ba=_shift_frames(state.ba, nf),
        bg=_shift_frames(state.bg, nf),
    )

    # --- prior column permutation: new frame k <- old frame k+1 ------------
    nd = cfg.nd
    perm = jnp.full((nd,), -1, jnp.int32)
    for k in range(nf - 1):
        perm = perm.at[15 * k : 15 * (k + 1)].set(
            jnp.arange(15 * (k + 1), 15 * (k + 2), dtype=jnp.int32)
        )
    perm = perm.at[15 * nf : nd].set(
        jnp.arange(15 * nf, nd, dtype=jnp.int32)
    )  # extrinsic
    prior_shifted = marg_mod.shift_prior(new_prior, perm)

    prior_state_new = state_new  # prior re-linearized at the post-BA estimate
    return state_new, data_new._replace(prior=prior_shifted, prior_state=prior_state_new)


def slide_window_new(
    state: WindowState, data: TrackData, cfg: WindowConfig,
    params: imu_mod.ImuParams = None,
):
    """Drop the second-newest frame (non-keyframe; slideWindow MARGIN_SECOND_NEW
    :1791-1846): merge its IMU samples into the previous interval, delete its
    observations, marginalize its dims from the prior, move frame NF-1 into
    slot NF-2."""
    nf = cfg.nf
    s, n = nf - 2, nf - 1  # second-newest, newest

    # --- prior: eliminate frame-s dims (prior rows only) --------------------
    # principled variant of the reference's pose-only drop: we remove both
    # pose and speed/bias dims of the dropped frame.
    nd = cfg.nd
    Jp, rp = marg_mod.marginalize_window(
        data.prior.J, data.prior.r0, nd, dense_start=15 * s, dense_size=15,
    )
    # the exact Schur complement preserves the prior's gauge nullspace, but
    # f32 re-injects O(ulp·‖H‖) gauge stiffness per slide — re-project
    Jp = marg_mod.project_out_nullspace(
        Jp, gauge_nullspace(data.prior_state, cfg)
    )
    # permute: frame s <- frame n (dims of dropped frame become the newest's)
    perm = jnp.arange(nd, dtype=jnp.int32)
    perm = perm.at[15 * s : 15 * (s + 1)].set(-1)
    prior_new = marg_mod.shift_prior(
        marg_mod.Prior(J=Jp, r0=rp, valid=data.prior.valid), perm
    )

    # --- merge IMU interval s-1..s with s..n into slot s-1? No: intervals are
    # (k -> k+1). Dropping frame s merges interval (s-1, s) and (s, n) into
    # (s-1, n) stored at slot s-1.
    # merged[i] = interval_{s-1}[i] for i < cnt_a, else interval_s[i - cnt_a].
    # Built at 2x capacity; if the union exceeds capacity I, the sequence is
    # decimated 2:1 (adjacent dt summed, midpoint samples dropped) — the
    # mid-point integration then runs at half rate over the SAME time span,
    # which preserves consistency (truncating the span would not).
    I = cfg.max_imu
    cnt_a = jnp.sum(data.imu_mask[s - 1].astype(jnp.int32))
    cnt_b = jnp.sum(data.imu_mask[s].astype(jnp.int32))
    idx2 = jnp.arange(2 * I)
    from_a = idx2 < cnt_a
    src_c = jnp.clip(idx2 - cnt_a, 0, I - 1)
    take = (idx2 >= cnt_a) & (idx2 - cnt_a < cnt_b)
    dt2 = jnp.where(
        from_a,
        data.imu_dt[s - 1][jnp.clip(idx2, 0, I - 1)],
        jnp.where(take, data.imu_dt[s][src_c], 0.0),
    )
    mask2 = jnp.where(idx2 < cnt_a, data.imu_mask[s - 1][jnp.clip(idx2, 0, I - 1)], take)
    # sample arrays [2I+1]; sample cnt_a of interval s-1 == sample 0 of s
    idx21 = jnp.arange(2 * I + 1)
    from_a1 = (idx21 < cnt_a)[:, None]
    srcA = jnp.clip(idx21, 0, I)
    src1_c = jnp.clip(idx21 - cnt_a, 0, I)
    acc2 = jnp.where(from_a1, data.imu_acc[s - 1][srcA], data.imu_acc[s][src1_c])
    gyr2 = jnp.where(from_a1, data.imu_gyr[s - 1][srcA], data.imu_gyr[s][src1_c])

    total = cnt_a + cnt_b
    overflow = total > I
    # clamp sample reads past the union boundary to the boundary sample (odd
    # totals would otherwise pull a zero-padded sample into the last step)
    tclamp = jnp.clip(total, 0, 2 * I)
    acc2 = jnp.where((idx21 > total)[:, None], acc2[tclamp][None, :], acc2)
    gyr2 = jnp.where((idx21 > total)[:, None], gyr2[tclamp][None, :], gyr2)

    # plain copy (first I steps) — valid when total <= I
    dt_keep = dt2[:I]
    mask_keep = mask2[:I]
    acc_keep = acc2[: I + 1]
    gyr_keep = gyr2[: I + 1]
    # 2:1 decimation — valid always (covers up to 2I steps)
    dt_dec = dt2[0::2] + dt2[1::2]
    mask_dec = mask2[0::2]
    acc_dec = acc2[0::2]
    gyr_dec = gyr2[0::2]

    dt_m = jnp.where(overflow, dt_dec, dt_keep)
    mask_new = jnp.where(overflow, mask_dec, mask_keep)
    acc_m = jnp.where(overflow, acc_dec[: I + 1], acc_keep)
    gyr_m = jnp.where(overflow, gyr_dec[: I + 1], gyr_keep)

    imu_dt = data.imu_dt.at[s - 1].set(dt_m).at[s].set(0.0)
    imu_acc = data.imu_acc.at[s - 1].set(acc_m)
    imu_gyr = data.imu_gyr.at[s - 1].set(gyr_m)
    imu_mask = data.imu_mask.at[s - 1].set(mask_new).at[s].set(False)
    imu_valid = data.imu_valid.at[s - 1].set(
        data.imu_valid[s - 1] & data.imu_valid[s]
    ).at[s].set(False)

    # re-preintegrate the merged interval (slideWindow's push_back of the
    # dropped frame's samples into pre_integrations[frame_count])
    if params is not None:
        pre_m = imu_mod.preintegrate(
            dt_m, acc_m, gyr_m, mask_new, state.ba[s - 1], state.bg[s - 1], params
        )
        imu_pre = jax.tree_util.tree_map(
            lambda buf, v: buf.at[s - 1].set(v), data.imu_pre, pre_m
        )
        imu_sqrt = data.imu_sqrt.at[s - 1].set(imu_mod.sqrt_information(pre_m))
    else:
        imu_pre = data.imu_pre
        imu_sqrt = data.imu_sqrt

    # --- observations: frame s loses its obs; frame n's move into slot s ----
    def drop_shift(obs, mask):
        obs2 = obs.at[:, s].set(obs[:, n])
        mask2 = mask.at[:, s].set(mask[:, n]).at[:, n].set(False)
        return obs2, mask2

    pt_obs, pt_mask = drop_shift(data.pt_obs, data.pt_mask)
    ln_obs, ln_mask = drop_shift(data.ln_obs, data.ln_mask)
    ln_vp, ln_vp_mask = drop_shift(data.ln_vp, data.ln_vp_mask)

    # tracks that started at frame n now start at s; tracks started at s keep
    # index but anchor obs replaced by frame-n obs only if they were seen at n
    pt_start = jnp.where(data.pt_start == n, s, data.pt_start)
    keep_pt = (data.pt_id >= 0) & (jnp.sum(pt_mask, axis=1) >= 1)
    keep_ln = (data.ln_id >= 0) & (jnp.sum(ln_mask, axis=1) >= 1)

    data_new = data._replace(
        pt_obs=pt_obs, pt_mask=pt_mask & keep_pt[:, None], pt_start=pt_start,
        pt_id=jnp.where(keep_pt, data.pt_id, -1),
        pt_solved=data.pt_solved & keep_pt,
        ln_obs=ln_obs, ln_mask=ln_mask & keep_ln[:, None],
        ln_vp=ln_vp, ln_vp_mask=ln_vp_mask & keep_ln[:, None],
        ln_id=jnp.where(keep_ln, data.ln_id, -1),
        ln_solved=data.ln_solved & keep_ln,
        imu_dt=imu_dt, imu_acc=imu_acc, imu_gyr=imu_gyr,
        imu_mask=imu_mask, imu_valid=imu_valid,
        imu_pre=imu_pre, imu_sqrt=imu_sqrt,
        relo_mask=jnp.zeros_like(data.relo_mask),
        relo_valid=jnp.asarray(False),
        frame_t=data.frame_t.at[s].set(data.frame_t[n]),
        prior=prior_new,
    )

    # states: frame s <- frame n
    state_new = state._replace(
        p=state.p.at[s].set(state.p[n]),
        q=state.q.at[s].set(state.q[n]),
        v=state.v.at[s].set(state.v[n]),
        ba=state.ba.at[s].set(state.ba[n]),
        bg=state.bg.at[s].set(state.bg[n]),
    )
    return state_new, data_new
