"""Loop closure + 4-DoF pose graph optimisation.

Re-design of ``pose_graph/src/{pose_graph.cpp,keyframe.cpp}``:

- keyframe features: FAST+BRIEF (ops/brief) instead of DVision BRIEF with a
  shipped pattern (keyframe.cpp computeBRIEFPoint:87),
- place retrieval: one cosine matmul against per-keyframe global binary
  signatures (the TPU-native replacement of the DBoW2 inverted-file query,
  pose_graph.cpp detectLoop:304-386 — same top-4 + skip-last-50 + score-gate
  semantics),
- geometric verify: Hamming descriptor matching (≤80 bits,
  keyframe.cpp searchByBRIEFDes:152) + batched PnP-RANSAC
  (keyframe.cpp PnPRANSAC:200) + the inlier/yaw/translation gates
  (:472-480),
- 4-DoF pose graph: {yaw, t} per keyframe, sequential edges to 4
  predecessors + loop edges with the reference's residual forms
  (FourDOFError pose_graph.h:159-201, loop weight /10 :203-248), solved by
  the shared LM engine with the first looped frame held fixed
  (optimize4DoF:403-580).

Fixed-capacity device arrays; the keyframe count is a traced scalar and all
reductions are masked.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import brief as brief_mod
from ..ops import mvg
from ..solver import lm as lm_mod
from ..utils.geometry import (
    quat_conj,
    quat_mul,
    quat_rotate,
    quat_to_rot,
    rot_to_quat,
    rot_to_ypr,
    ypr_to_rot,
)


class PoseGraphConfig(NamedTuple):
    max_keyframes: int = 256  # initial capacity; the DB doubles when full
    n_features: int = 256  # FAST+BRIEF per keyframe (reference: 500)
    n_window_pts: int = 64  # tracked window points carried for PnP
    skip_recent: int = 50  # detectLoop exclusion zone
    min_score: float = 0.08  # absolute best-candidate floor (DBoW 0.05 analog)
    # secondary gate for the non-best candidates (DBoW 0.015 analog,
    # pose_graph.cpp:374-383): all candidates above it are verification-
    # eligible, tried OLDEST-first — looping to the oldest map region
    # maximizes drift correction
    min_score_2: float = 0.024
    # r5 relative gating (BoW signatures are scene-calibrated, not
    # absolutely calibrated): a candidate is eligible only if it scores at
    # least as high as the query's own RECENT temporal neighbors (the
    # minScore idea of detectLoop/ORB-style retrieval: floor = min cosine
    # against the last recent_ref keyframes) AND within rel_margin of the
    # best non-recent candidate (the revisit plateau)
    recent_ref: int = 10
    rel_margin: float = 0.02
    # host-side staging backlog cap: jobs beyond this are dropped oldest-
    # first (the reference's pose-graph process thread also discards
    # backlog by only consuming the newest measurements)
    max_backlog: int = 8
    top_k: int = 4
    min_matches: int = 20  # MIN_LOOP_NUM
    pnp_thresh: float = 8.0 / 460.0
    max_yaw: float = 30.0  # deg gate
    max_t: float = 20.0  # m gate
    seq_edges: int = 4
    pgo_iters: int = 6
    # keyframe throttling (pose_graph_node.cpp:294-336 SKIP_CNT/SKIP_DIS):
    # insert only every (skip_cnt+1)-th incoming VIO keyframe, and only when
    # it has moved at least skip_dis meters from the last inserted one
    skip_cnt: int = 0
    skip_dis: float = 0.0
    loop_edge_weight: float = 1.0  # reference FourDOFWeightError uses 1.0


class KeyframeDB(NamedTuple):
    count: jnp.ndarray  # [] int32
    seq: jnp.ndarray  # [K] int32 sequence id (0 = loaded prior map, held fixed)
    p_vio: jnp.ndarray  # [K, 3] VIO pose at insertion
    q_vio: jnp.ndarray  # [K, 4]
    p_pgo: jnp.ndarray  # [K, 3] optimized
    yaw_pgo: jnp.ndarray  # [K] optimized yaw (deg)
    sig: jnp.ndarray  # [K, SIG_DIM] spatially-pooled signatures
    desc: jnp.ndarray  # [K, F, 8] uint32 FAST+BRIEF
    kp_norm: jnp.ndarray  # [K, F, 2] normalized coords of FAST corners
    kp_valid: jnp.ndarray  # [K, F]
    wdesc: jnp.ndarray  # [K, Wp, 8] descriptors at tracked window points
    w3d: jnp.ndarray  # [K, Wp, 3] their world 3D (VIO frame)
    w_valid: jnp.ndarray  # [K, Wp]
    loop_to: jnp.ndarray  # [K] int32 loop target (-1)
    loop_t: jnp.ndarray  # [K, 3] relative translation (in old frame)
    loop_yaw: jnp.ndarray  # [K] relative yaw (deg)


def empty_db(cfg: PoseGraphConfig, dtype=jnp.float64) -> KeyframeDB:
    K, F, Wp = cfg.max_keyframes, cfg.n_features, cfg.n_window_pts
    return KeyframeDB(
        count=jnp.asarray(0, jnp.int32),
        # default live sequence is 1; seq 0 marks keyframes of a LOADED prior
        # map, which the PGO holds constant (set by SlamSystem.load_map)
        seq=jnp.ones((K,), jnp.int32),
        p_vio=jnp.zeros((K, 3), dtype),
        q_vio=jnp.zeros((K, 4), dtype).at[:, 0].set(1.0),
        p_pgo=jnp.zeros((K, 3), dtype),
        yaw_pgo=jnp.zeros((K,), dtype),
        sig=jnp.zeros((K, brief_mod.SIG_DIM), jnp.float32),
        desc=jnp.zeros((K, F, 8), jnp.uint32),
        kp_norm=jnp.zeros((K, F, 2), dtype),
        kp_valid=jnp.zeros((K, F), bool),
        wdesc=jnp.zeros((K, Wp, 8), jnp.uint32),
        w3d=jnp.zeros((K, Wp, 3), dtype),
        w_valid=jnp.zeros((K, Wp), bool),
        loop_to=jnp.full((K,), -1, jnp.int32),
        loop_t=jnp.zeros((K, 3), dtype),
        loop_yaw=jnp.zeros((K,), dtype),
    )


def extract_keyframe_features(img, cam_lift, cfg: PoseGraphConfig, window_xy=None):
    """FAST+BRIEF on the keyframe image (+BRIEF at tracked window points).

    cam_lift: pixel->normalized function.  Returns the per-keyframe feature
    block to pass to add_keyframe.
    """
    xy, valid = brief_mod.detect_fast(img, cfg.n_features)
    desc = brief_mod.describe_brief(img, xy, valid)
    norm = cam_lift(xy)[..., 0:2]
    sig = brief_mod.global_signature(desc, valid, xy=xy, img_hw=img.shape)
    out = {"desc": desc, "kp_norm": norm, "kp_valid": valid, "sig": sig}
    if window_xy is not None:
        wxy, wvalid = window_xy
        # snap each window point to the co-detected FAST corner within 3 px
        # (keep the tracked position otherwise): KLT-tracked positions
        # accumulate a few px of drift, and a BRIEF described off-center
        # does not Hamming-match the old keyframe's corner-centered BRIEF —
        # measured to zero out loop verification.  Describing both sides at
        # the SAME detector's localization restores the match (the 3D stays
        # the window point's).
        d2 = jnp.sum(
            (wxy[:, None, :] - xy[None, :, :]) ** 2, axis=-1
        )
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        nn = jnp.argmin(d2, axis=1)
        near = jnp.min(d2, axis=1) < 9.0
        snapped = jnp.where(near[:, None], xy[nn], wxy)
        out["wdesc"] = brief_mod.describe_brief(img, snapped, wvalid)
    return out


def add_keyframe(
    db: KeyframeDB, cfg: PoseGraphConfig, p_vio, q_vio, sig, desc, kp_norm,
    kp_valid, wdesc, w3d, w_valid, seq=1,
):
    k = db.count
    # seed PGO state with drift-corrected VIO pose
    yaw_vio = rot_to_ypr(quat_to_rot(q_vio))[0]
    return db._replace(
        count=k + 1,
        seq=db.seq.at[k].set(jnp.asarray(seq, jnp.int32)),
        p_vio=db.p_vio.at[k].set(p_vio),
        q_vio=db.q_vio.at[k].set(q_vio),
        p_pgo=db.p_pgo.at[k].set(p_vio),
        yaw_pgo=db.yaw_pgo.at[k].set(yaw_vio),
        sig=db.sig.at[k].set(sig.astype(jnp.float32)),
        desc=db.desc.at[k].set(desc),
        kp_norm=db.kp_norm.at[k].set(kp_norm),
        kp_valid=db.kp_valid.at[k].set(kp_valid),
        wdesc=db.wdesc.at[k].set(wdesc),
        w3d=db.w3d.at[k].set(w3d),
        w_valid=db.w_valid.at[k].set(w_valid),
    )


def retrieve_candidates(db: KeyframeDB, cfg: PoseGraphConfig, sig, query_seq=None):
    """Coarse place retrieval: cosine score against all stored signatures,
    excluding the most recent skip_recent frames (detectLoop:304-386).

    Keyframes from OTHER sequences (earlier sessions / a loaded prior map)
    are exempt from the recency exclusion — the zone only guards trivial
    same-trajectory hits, and a cross-sequence relocalization may legally
    match a keyframe stored moments ago (r4 advisor finding: the host-side
    cross_seq exemption was unreachable because this mask had already
    dropped the candidate).  Pass query_seq (int32 scalar) to enable.

    Returns (idx [top_k], score [top_k], floor) where floor is the query's
    MINIMUM similarity to its own recent_ref temporal neighbors — the
    scene-calibrated baseline a genuine revisit must exceed (detectLoop's
    minScore idea; absolute thresholds don't transfer across scenes).

    Scores are cosines of MEAN-CENTERED signatures (DBoW's idf in
    projection form): self-similar scenes give every raw signature a large
    common-mode component (measured ≥0.98 raw cosine between ALL keyframe
    pairs of the blob-world e2e); subtracting the database's mean
    signature scores only the distinctive remainder."""
    k = db.count
    idx = jnp.arange(db.sig.shape[0])
    active = (idx < k)[:, None].astype(jnp.float32)
    mu = jnp.sum(db.sig * active, axis=0) / jnp.maximum(
        jnp.sum(active), 1.0
    )
    S = db.sig - mu[None, :]
    q = sig.astype(jnp.float32) - mu
    qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
    Sn = S / jnp.maximum(
        jnp.linalg.norm(S, axis=1, keepdims=True), 1e-9
    )
    scores = Sn @ qn  # [K]
    eligible = (idx < k - cfg.skip_recent) & (idx >= 0)
    if query_seq is not None:
        eligible = eligible | ((db.seq != query_seq) & (idx < k))
    # neighbor floor over the last recent_ref stored keyframes (exclude the
    # query itself, which is already stored at k-1 when this runs)
    recent = (idx >= k - 1 - cfg.recent_ref) & (idx < k - 1)
    floor = jnp.min(jnp.where(recent, scores, jnp.inf))
    floor = jnp.where(jnp.isfinite(floor), floor, 0.0)
    scores = jnp.where(eligible, scores, -1.0)
    top_s, top_i = jax.lax.top_k(scores, cfg.top_k)
    return top_i, top_s, floor


class LoopResult(NamedTuple):
    ok: jnp.ndarray  # [] bool: passed inlier/yaw/translation gates
    rel_t: jnp.ndarray  # [3] cur position in the old keyframe's frame
    rel_yaw: jnp.ndarray  # [] deg
    n_inliers: jnp.ndarray  # [] int32
    n_matches: jnp.ndarray  # [] int32 descriptor matches fed to PnP
    obs_old: jnp.ndarray  # [Wp, 2] matched normalized coords in old keyframe
    match_mask: jnp.ndarray  # [Wp] bool: descriptor match AND PnP inlier
    p_old: jnp.ndarray  # [3] PnP old-keyframe pose in the CURRENT vio frame
    q_old: jnp.ndarray  # [4]


def verify_loop(
    db: KeyframeDB, cfg: PoseGraphConfig, cand, wdesc, w3d, w_valid,
    p_cur, q_cur, key, q_ic=None, p_ic=None,
) -> LoopResult:
    """Descriptor match + PnP-RANSAC + gates against one candidate keyframe
    (keyframe.cpp findConnection:259-480).

    obs_old/match_mask feed the estimator's fast-relocalization factors
    (keyframe.cpp:488-513 publishes exactly the matched old-frame norm
    points + ids); p_old/q_old (the PnP camera pose expressed in the current
    session's VIO world, since w3d lives there) seed the 6-dof relo pose —
    valid even when the candidate belongs to another sequence/map."""
    old_desc = db.desc[cand]
    old_valid = db.kp_valid[cand]
    old_norm = db.kp_norm[cand]

    # margin + mutual gating (see match_descriptors): at the ~50% wrong-match
    # rate ambiguous scenes produce under the plain 80-bit gate, 6-point DLT
    # RANSAC needs ~0.5^-6 = 64x more hypotheses than the inlier budget
    # allows; precision-gated matches trade recall for a usable inlier rate
    midx, dist = brief_mod.match_descriptors(
        wdesc, w_valid, old_desc, old_valid, margin=16, mutual=True
    )
    m_ok = midx >= 0
    safe = jnp.where(m_ok, midx, 0)
    obs_old = old_norm[safe]  # [Wp, 2] matched 2D in old frame

    # 128 hypotheses: descriptor matching on weakly-textured scenes runs at
    # ~50% outlier rate, where 32 six-point DLT samples succeed only ~40%
    # of the time (0.5^6 per sample); 128 lifts that to ~87%
    R0, t0, inl, n_inl = mvg.ransac_pnp(
        w3d, obs_old, m_ok, key, n_hyp=256, threshold=cfg.pnp_thresh
    )
    # T_old_w: x_old_cam = R0 x_w + t0 -> old CAMERA pose in world, then to
    # the body frame via the camera-IMU extrinsic (keyframe.cpp PnPRANSAC
    # :232-236 does exactly this with qic/tic)
    R_w_oldc = R0.T
    p_w_oldc = -R0.T @ t0
    if q_ic is not None:
        R_ic = quat_to_rot(q_ic)
        R_w_old = R_w_oldc @ R_ic.T
        p_old_pnp = p_w_oldc - R_w_old @ p_ic
    else:
        R_w_old = R_w_oldc
        p_old_pnp = p_w_oldc
    q_w_old = rot_to_quat(R_w_old)

    # relative pose: cur body expressed in the PnP-estimated old frame
    rel_t = quat_rotate(quat_conj(q_w_old), p_cur - p_old_pnp)
    yaw_cur = rot_to_ypr(quat_to_rot(q_cur))[0]
    yaw_old = rot_to_ypr(quat_to_rot(q_w_old))[0]
    rel_yaw = yaw_cur - yaw_old

    # gate against the DB pose of the old keyframe (abs motion plausibility)
    ok = (
        (n_inl >= cfg.min_matches)
        & (jnp.abs((rel_yaw + 180.0) % 360.0 - 180.0) < cfg.max_yaw)
        & (jnp.linalg.norm(rel_t) < cfg.max_t)
    )
    return LoopResult(
        ok=ok, rel_t=rel_t, rel_yaw=rel_yaw, n_inliers=n_inl,
        n_matches=jnp.sum(m_ok.astype(jnp.int32)),
        obs_old=obs_old, match_mask=m_ok & inl,
        p_old=p_old_pnp, q_old=q_w_old,
    )


def record_loop(db: KeyframeDB, k, cand, rel_t, rel_yaw):
    return db._replace(
        loop_to=db.loop_to.at[k].set(cand),
        loop_t=db.loop_t.at[k].set(rel_t),
        loop_yaw=db.loop_yaw.at[k].set(rel_yaw),
    )


# ---------------------------------------------------------------------------
# 4-DoF pose graph optimisation
# ---------------------------------------------------------------------------


def optimize_4dof(db: KeyframeDB, cfg: PoseGraphConfig):
    """Masked fixed-shape 4-DoF PGO over the whole DB (optimize4DoF:403-580).

    Parameters per keyframe: [yaw (deg), x, y, z].  Pitch/roll are taken from
    VIO and held fixed (AngleLocalParameterization semantics).  The earliest
    keyframe is the gauge anchor.
    """
    K = db.p_vio.shape[0]
    dtype = db.p_vio.dtype
    count = db.count
    active = jnp.arange(K) < count

    ypr_vio = jax.vmap(lambda q: rot_to_ypr(quat_to_rot(q)))(db.q_vio)  # [K,3]

    # measurements between i and j from VIO: t_ij in frame i, yaw_ij
    def rel_meas(i, j):
        Ri = ypr_to_rot(ypr_vio[i])
        t = Ri.T @ (db.p_vio[j] - db.p_vio[i])
        dyaw = ypr_vio[j, 0] - ypr_vio[i, 0]
        return t, dyaw

    def residual(x):
        yaw = x[:, 0]
        t = x[:, 1:4]

        def edge_res(i, j, t_meas, yaw_meas, w):
            ypr_i = jnp.stack([yaw[i], ypr_vio[i, 1], ypr_vio[i, 2]])
            Ri = ypr_to_rot(ypr_i)
            r_t = Ri.T @ (t[j] - t[i]) - t_meas
            r_y = (yaw[j] - yaw[i] - yaw_meas + 180.0) % 360.0 - 180.0
            return jnp.concatenate([r_t, r_y[None] / 10.0]) * w

        # sequential edges: j to its up-to-4 predecessors IN THE SAME SEQUENCE
        # (optimize4DoF checks sequence_array[i] == sequence_array[i-j])
        def seq_edges(j):
            def one(d):
                i = j - d
                okd = (i >= 0) & active[j] & (j >= 1)
                isafe = jnp.maximum(i, 0)
                okd = okd & (db.seq[isafe] == db.seq[j])
                tm, ym = rel_meas(isafe, j)
                return edge_res(isafe, j, tm, ym, okd.astype(dtype))

            return jax.vmap(one)(jnp.arange(1, cfg.seq_edges + 1))

        r_seq = jax.vmap(seq_edges)(jnp.arange(K))  # [K, E, 4]

        # loop edges (weight: yaw /10 like FourDOFWeightError)
        def loop_edge(j):
            i = db.loop_to[j]
            okl = (i >= 0) & active[j]
            isafe = jnp.maximum(i, 0)
            return edge_res(
                isafe, j, db.loop_t[j], db.loop_yaw[j], okl.astype(dtype)
            ) * cfg.loop_edge_weight

        r_loop = jax.vmap(loop_edge)(jnp.arange(K))  # [K, 4]

        # gauge: pin the first keyframe, and hold every keyframe of a loaded
        # prior map (seq == 0) constant (optimize4DoF: "(*it)->sequence == 0"
        # frames are SetParameterBlockConstant)
        fixed = (jnp.arange(K) == 0) | ((db.seq == 0) & active)
        r_gauge = (
            jnp.concatenate(
                [x[:, 1:4] - db.p_pgo, (x[:, 0:1] - db.yaw_pgo[:, None])],
                axis=1,
            )
            * fixed[:, None].astype(dtype)
            * 100.0
        )
        return jnp.concatenate(
            [r_seq.reshape(-1), r_loop.reshape(-1), r_gauge.reshape(-1)]
        )

    x0 = jnp.concatenate([db.yaw_pgo[:, None], db.p_pgo], axis=1)
    # re-seed from VIO for inactive entries to keep residuals zero there
    spec = lm_mod.SchurSpec(dense_dim=4 * K)
    out = lm_mod.lm_solve(
        lambda x: residual(x.reshape(K, 4)),
        lambda x, d: x + d,
        x0.reshape(-1),
        spec,
        lm_mod.LMConfig(num_iters=cfg.pgo_iters),
    )
    xf = out.x.reshape(K, 4)
    return db._replace(yaw_pgo=xf[:, 0], p_pgo=xf[:, 1:4]), out


def rebase_sequence(db: KeyframeDB, cfg: PoseGraphConfig, k_cur, cand):
    """Re-base the current sequence onto the old map at its first
    inter-sequence loop (pose_graph.cpp:103-124): compute the yaw+t shift
    that moves the loop keyframe onto (old pose ∘ loop relative), then apply
    it to every keyframe of the same sequence (their VIO and PGO poses).
    """
    dtype = db.p_vio.dtype
    # world target of the current keyframe from the old keyframe + loop edge
    ypr_old = rot_to_ypr(quat_to_rot(db.q_vio[cand]))
    R_old = ypr_to_rot(ypr_old)
    w_p_cur = R_old @ db.loop_t[k_cur] + db.p_vio[cand]
    w_yaw_cur = ypr_old[0] + db.loop_yaw[k_cur]

    yaw_vio_cur = rot_to_ypr(quat_to_rot(db.q_vio[k_cur]))[0]
    shift_yaw = w_yaw_cur - yaw_vio_cur
    z = jnp.zeros_like(shift_yaw)
    R_s = ypr_to_rot(jnp.stack([shift_yaw, z, z]))
    t_s = w_p_cur - R_s @ db.p_vio[k_cur]
    q_s = rot_to_quat(R_s)

    member = (db.seq == db.seq[k_cur]) & (jnp.arange(db.seq.shape[0]) < db.count)
    p_vio2 = jnp.where(
        member[:, None], (db.p_vio @ R_s.T) + t_s, db.p_vio
    )
    q_vio2 = jnp.where(
        member[:, None], jax.vmap(lambda q: quat_mul(q_s, q))(db.q_vio), db.q_vio
    )
    p_pgo2 = jnp.where(member[:, None], (db.p_pgo @ R_s.T) + t_s, db.p_pgo)
    yaw_pgo2 = jnp.where(member, db.yaw_pgo + shift_yaw, db.yaw_pgo)
    return db._replace(
        p_vio=p_vio2, q_vio=q_vio2, p_pgo=p_pgo2, yaw_pgo=yaw_pgo2
    ), (R_s, t_s)


def grow_db(db: KeyframeDB, factor: int = 2) -> KeyframeDB:
    """Host-side capacity doubling (the reference's pose graph grows
    unboundedly, pose_graph.cpp keyframelist; here fixed device shapes double
    when full — O(log N) recompiles of the shape-keyed PGO programs).

    New rows get the same defaults as empty_db so masked programs treat them
    as inactive.
    """
    K = db.p_vio.shape[0]
    extra = K * (factor - 1)
    dtype = db.p_vio.dtype

    def pad0(a):
        return jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0
        )

    q_pad = jnp.zeros((extra, 4), dtype).at[:, 0].set(1.0)
    return db._replace(
        seq=jnp.concatenate([db.seq, jnp.ones((extra,), jnp.int32)]),
        p_vio=pad0(db.p_vio),
        q_vio=jnp.concatenate([db.q_vio, q_pad]),
        p_pgo=pad0(db.p_pgo),
        yaw_pgo=pad0(db.yaw_pgo),
        sig=pad0(db.sig),
        desc=pad0(db.desc),
        kp_norm=pad0(db.kp_norm),
        kp_valid=pad0(db.kp_valid),
        wdesc=pad0(db.wdesc),
        w3d=pad0(db.w3d),
        w_valid=pad0(db.w_valid),
        loop_to=jnp.concatenate([db.loop_to, jnp.full((extra,), -1, jnp.int32)]),
        loop_t=pad0(db.loop_t),
        loop_yaw=pad0(db.loop_yaw),
    )


def save_db(db: KeyframeDB, path):
    """Persist the keyframe database (savePoseGraph:697 parity — poses,
    loop_info, keypoints and packed descriptors in one npz)."""
    import numpy as np

    np.savez_compressed(path, **{k: np.asarray(v) for k, v in db._asdict().items()})


def load_db(path) -> KeyframeDB:
    """Reload a persisted database (loadPoseGraph:752 parity); enables
    multi-session relocalization against a prior map."""
    import numpy as np

    with np.load(path) as z:
        return KeyframeDB(**{k: jnp.asarray(z[k]) for k in z.files})


def drift_correction(db: KeyframeDB, cfg: PoseGraphConfig):
    """(R_drift yaw-only, t_drift) mapping VIO poses into the corrected frame
    (optimize4DoF:549-573): computed at the newest optimized keyframe."""
    k = jnp.maximum(db.count - 1, 0)
    yaw_vio = rot_to_ypr(quat_to_rot(db.q_vio[k]))[0]
    dyaw = db.yaw_pgo[k] - yaw_vio
    z = jnp.zeros_like(dyaw)
    R_drift = ypr_to_rot(jnp.stack([dyaw, z, z]))
    t_drift = db.p_pgo[k] - R_drift @ db.p_vio[k]
    return R_drift, t_drift
