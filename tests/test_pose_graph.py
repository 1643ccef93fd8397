import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import pose_graph as pg
from vplines_slam_tpu.ops import brief as brief_mod
from vplines_slam_tpu.utils import geometry as geo


def test_fast_detects_corners():
    # isolated bright squares: their corners have ~12-pixel contiguous FAST
    # arcs (checkerboard crossings do NOT trigger FAST — arcs are only 4)
    H, W = 160, 160
    img = np.zeros((H, W))
    centers = [(40, 40), (40, 100), (100, 40), (100, 100), (70, 70)]
    for cy, cx in centers:
        img[cy - 10 : cy + 10, cx - 10 : cx + 10] = 1.0
    xy, valid = brief_mod.detect_fast(jnp.asarray(img), max_corners=64, thresh=0.3)
    n = int(jnp.sum(valid))
    assert n >= 8
    # every detection is near a square corner
    corners = np.array(
        [
            (cx + sx * 10, cy + sy * 10)
            for (cy, cx) in centers
            for sx in (-1, 1)
            for sy in (-1, 1)
        ]
    )
    pts = np.asarray(xy[valid])
    d = np.linalg.norm(pts[:, None, :] - corners[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 4.0


def test_brief_descriptors_discriminative(rng=np.random.default_rng(3)):
    from tests.test_frontend_ops import smooth_texture

    img = smooth_texture(rng, H=160, W=160)
    pts = jnp.asarray(rng.uniform(40, 120, size=(20, 2)))
    valid = jnp.ones(20, bool)
    d1 = brief_mod.describe_brief(img, pts, valid)
    # same keypoints, slightly shifted image -> small distance
    from vplines_slam_tpu.ops.image import bilinear_sample

    yy, xx = jnp.meshgrid(
        jnp.arange(160, dtype=jnp.float64), jnp.arange(160, dtype=jnp.float64),
        indexing="ij",
    )
    img2 = bilinear_sample(img, jnp.stack([xx + 0.5, yy + 0.5], -1))
    d2 = brief_mod.describe_brief(img2, pts - 0.5, valid)
    dist_same = jnp.diag(brief_mod.hamming_matrix(d1, d2))
    dist_cross = brief_mod.hamming_matrix(d1, d2)
    off = dist_cross + jnp.eye(20, dtype=jnp.int32) * 1000
    assert float(jnp.mean(dist_same)) < 40
    assert float(jnp.mean(jnp.min(off, axis=1))) > 60
    # matcher finds the identity permutation
    idx, dist = brief_mod.match_descriptors(d1, valid, d2, valid)
    assert int(jnp.sum(idx == jnp.arange(20))) >= 18


def test_global_signature_similarity(rng=np.random.default_rng(5)):
    from tests.test_frontend_ops import smooth_texture

    imgA = smooth_texture(rng, H=160, W=160)
    imgB = smooth_texture(np.random.default_rng(99), H=160, W=160)
    pts = jnp.asarray(rng.uniform(40, 120, size=(64, 2)))
    valid = jnp.ones(64, bool)
    sA1 = brief_mod.global_signature(brief_mod.describe_brief(imgA, pts, valid), valid)
    sA2 = brief_mod.global_signature(
        brief_mod.describe_brief(imgA, pts + 1.0, valid), valid
    )
    sB = brief_mod.global_signature(brief_mod.describe_brief(imgB, pts, valid), valid)
    assert float(sA1 @ sA2) > float(sA1 @ sB) + 0.1


def make_drifted_db(cfg, n_kf=40, drift_per_step=0.02, yaw_drift=0.3):
    """Ground truth: circle; VIO poses drift in yaw+position; loop edge
    between last KF and KF 0 carries the true relative pose."""
    db = pg.empty_db(cfg)
    truth_p, truth_yaw = [], []
    R = 5.0
    for k in range(n_kf):
        th = 2 * np.pi * k / n_kf
        truth_p.append([R * np.cos(th), R * np.sin(th), 0.1 * np.sin(3 * th)])
        truth_yaw.append(np.degrees(th + np.pi / 2))
    truth_p = np.asarray(truth_p)
    truth_yaw = np.asarray(truth_yaw)

    # drifted VIO: cumulative yaw error rotates subsequent increments
    p_vio = [truth_p[0]]
    yaw_vio = [truth_yaw[0]]
    for k in range(1, n_kf):
        dyaw_err = yaw_drift  # deg per step
        yaw_vio.append(yaw_vio[-1] + (truth_yaw[k] - truth_yaw[k - 1]) + dyaw_err)
        R_err = np.asarray(
            geo.ypr_to_rot(jnp.asarray([yaw_vio[-1] - truth_yaw[k], 0.0, 0.0]))
        )
        d_true = truth_p[k] - truth_p[k - 1]
        p_vio.append(p_vio[-1] + R_err @ d_true + drift_per_step)
    p_vio = np.asarray(p_vio)
    yaw_vio = np.asarray(yaw_vio)

    for k in range(n_kf):
        q = geo.rot_to_quat(geo.ypr_to_rot(jnp.asarray([yaw_vio[k], 0.0, 0.0])))
        db = db._replace(
            count=jnp.asarray(k + 1, jnp.int32),
            p_vio=db.p_vio.at[k].set(jnp.asarray(p_vio[k])),
            q_vio=db.q_vio.at[k].set(q),
            p_pgo=db.p_pgo.at[k].set(jnp.asarray(p_vio[k])),
            yaw_pgo=db.yaw_pgo.at[k].set(yaw_vio[k]),
        )
    # loop edge: last KF -> KF 0 with TRUE relative measurement
    Ri = np.asarray(geo.ypr_to_rot(jnp.asarray([truth_yaw[0], 0.0, 0.0])))
    rel_t = Ri.T @ (truth_p[-1] - truth_p[0])
    rel_yaw = truth_yaw[-1] - truth_yaw[0]
    db = pg.record_loop(
        db, n_kf - 1, 0, jnp.asarray(rel_t), jnp.asarray(rel_yaw)
    )
    return db, truth_p, truth_yaw


def test_pgo_corrects_drift():
    cfg = pg.PoseGraphConfig(max_keyframes=64, pgo_iters=10)
    db, truth_p, truth_yaw = make_drifted_db(cfg)
    n_kf = len(truth_p)
    err_before = np.linalg.norm(np.asarray(db.p_pgo[:n_kf]) - truth_p, axis=1)
    db2, out = pg.optimize_4dof(db, cfg)
    err_after = np.linalg.norm(np.asarray(db2.p_pgo[:n_kf]) - truth_p, axis=1)
    # drift at the loop frame largely removed
    assert err_after[-1] < err_before[-1] * 0.3
    assert err_after.mean() < err_before.mean() * 0.6
    # drift correction maps VIO -> corrected frame consistently
    R_d, t_d = pg.drift_correction(db2, cfg)
    p_corr = np.asarray(R_d @ db2.p_vio[n_kf - 1] + t_d)
    np.testing.assert_allclose(p_corr, np.asarray(db2.p_pgo[n_kf - 1]), atol=1e-6)


def test_retrieval_excludes_recent():
    cfg = pg.PoseGraphConfig(max_keyframes=128, skip_recent=10, top_k=2)
    db = pg.empty_db(cfg)
    rng = np.random.default_rng(0)
    sigs = rng.standard_normal((60, db.sig.shape[1])).astype(np.float32)
    sigs /= np.linalg.norm(sigs, axis=1, keepdims=True)
    db = db._replace(
        count=jnp.asarray(60, jnp.int32), sig=db.sig.at[:60].set(jnp.asarray(sigs))
    )
    # query equal to sig[55] (recent) and sig[5] (old)
    idx, score, floor = pg.retrieve_candidates(db, cfg, jnp.asarray(sigs[55]))
    assert 55 not in np.asarray(idx)  # excluded (recent)
    idx, score, floor = pg.retrieve_candidates(db, cfg, jnp.asarray(sigs[5]))
    assert int(idx[0]) == 5 and float(score[0]) > 0.99
    # the neighbor floor is the min similarity to the last recent_ref
    # stored keyframes — near-orthogonal random signatures give a low floor
    assert float(floor) < 0.5


def _true_circle(n_kf, R=5.0):
    p, yaw = [], []
    for k in range(n_kf):
        th = 2 * np.pi * k / n_kf
        p.append([R * np.cos(th), R * np.sin(th), 0.0])
        yaw.append(np.degrees(th + np.pi / 2))
    return np.asarray(p), np.asarray(yaw)


def _set_kf(db, k, p, yaw, seq):
    q = geo.rot_to_quat(geo.ypr_to_rot(jnp.asarray([yaw, 0.0, 0.0])))
    return db._replace(
        count=jnp.maximum(db.count, k + 1),
        seq=db.seq.at[k].set(seq),
        p_vio=db.p_vio.at[k].set(jnp.asarray(p)),
        q_vio=db.q_vio.at[k].set(q),
        p_pgo=db.p_pgo.at[k].set(jnp.asarray(p)),
        yaw_pgo=db.yaw_pgo.at[k].set(yaw),
    )


def test_multisequence_rebase():
    """A second sequence starts in its own VIO frame (estimator reboot);
    the first inter-sequence loop re-bases it onto the old map
    (pose_graph.cpp:103-124)."""
    cfg = pg.PoseGraphConfig(max_keyframes=64)
    truth_p, truth_yaw = _true_circle(30)
    db = pg.empty_db(cfg)
    # sequence 1: KFs 0..19 exactly at truth
    for k in range(20):
        db = _set_kf(db, k, truth_p[k], truth_yaw[k], seq=1)
    # sequence 2: KFs 20..29, VIO restarted -> poses in a shifted frame
    dyaw = 40.0
    R_off = np.asarray(geo.ypr_to_rot(jnp.asarray([dyaw, 0.0, 0.0])))
    t_off = np.asarray([3.0, -2.0, 0.5])
    for k in range(20, 30):
        p2 = R_off.T @ (truth_p[k] - t_off)  # inverse shift = seq-2 frame
        db = _set_kf(db, k, p2, truth_yaw[k] - dyaw, seq=2)
    # loop edge: KF 25 (seq 2) onto KF 5 (seq 1), true relative pose
    Ri = np.asarray(geo.ypr_to_rot(jnp.asarray([truth_yaw[5], 0.0, 0.0])))
    rel_t = Ri.T @ (truth_p[25] - truth_p[5])
    rel_yaw = truth_yaw[25] - truth_yaw[5]
    db = pg.record_loop(db, 25, 5, jnp.asarray(rel_t), jnp.asarray(rel_yaw))

    db2, (R_s, t_s) = pg.rebase_sequence(db, cfg, 25, 5)
    # sequence-2 keyframes land on truth
    err = np.linalg.norm(np.asarray(db2.p_vio[20:30]) - truth_p[20:30], axis=1)
    assert err.max() < 1e-6
    # sequence-1 keyframes untouched
    np.testing.assert_allclose(
        np.asarray(db2.p_vio[:20]), truth_p[:20], atol=1e-12
    )
    # returned shift maps seq-2 frame onto the map frame
    p_chk = np.asarray(R_s) @ np.asarray(db.p_vio[22]) + np.asarray(t_s)
    np.testing.assert_allclose(p_chk, truth_p[22], atol=1e-6)


def test_pgo_holds_loaded_map_fixed():
    """Keyframes of a loaded prior map (seq 0) stay constant in the 4-DoF
    PGO (optimize4DoF SetParameterBlockConstant on sequence-0 frames)."""
    cfg = pg.PoseGraphConfig(max_keyframes=64, pgo_iters=8)
    truth_p, truth_yaw = _true_circle(30)
    db = pg.empty_db(cfg)
    for k in range(15):
        db = _set_kf(db, k, truth_p[k], truth_yaw[k], seq=0)
    rng = np.random.default_rng(2)
    for k in range(15, 30):
        db = _set_kf(
            db, k,
            truth_p[k] + rng.normal(0, 0.2, 3),
            truth_yaw[k] + rng.normal(0, 2.0),
            seq=1,
        )
    # two loop edges pinning the live sequence to the prior map
    for k_cur, k_old in [(20, 5), (28, 10)]:
        Ri = np.asarray(geo.ypr_to_rot(jnp.asarray([truth_yaw[k_old], 0.0, 0.0])))
        rel_t = Ri.T @ (truth_p[k_cur] - truth_p[k_old])
        db = pg.record_loop(
            db, k_cur, k_old, jnp.asarray(rel_t),
            jnp.asarray(truth_yaw[k_cur] - truth_yaw[k_old]),
        )
    db2, _ = pg.optimize_4dof(db, cfg)
    # prior map did not move
    np.testing.assert_allclose(
        np.asarray(db2.p_pgo[:15]), truth_p[:15], atol=1e-3
    )
    # live sequence pulled toward truth at the loop keyframes
    err_before = np.linalg.norm(np.asarray(db.p_pgo[20]) - truth_p[20])
    err_after = np.linalg.norm(np.asarray(db2.p_pgo[20]) - truth_p[20])
    assert err_after < err_before


def test_map_save_load_roundtrip(tmp_path):
    cfg = pg.PoseGraphConfig(max_keyframes=32)
    truth_p, truth_yaw = _true_circle(10)
    db = pg.empty_db(cfg)
    for k in range(10):
        db = _set_kf(db, k, truth_p[k], truth_yaw[k], seq=1)
    path = str(tmp_path / "map.npz")
    pg.save_db(db, path)
    db2 = pg.load_db(path)
    assert int(db2.count) == 10
    np.testing.assert_allclose(np.asarray(db2.p_vio), np.asarray(db.p_vio))
    np.testing.assert_array_equal(np.asarray(db2.seq), np.asarray(db.seq))


def test_multicandidate_loop_verifies_oldest_first():
    """Gated retrieval candidates are verified OLDEST-first with fallback:
    the reference picks the min-index candidate among those above the
    secondary score gate (pose_graph.cpp detectLoop:374-383 min_index); on
    top of that, if PnP verification fails the next-oldest eligible
    candidate is tried (the reference gives up).  Exercised through the
    SlamSystem staging machinery with scripted retrieval/verification."""
    from vplines_slam_tpu.models import camera as cam_mod
    from vplines_slam_tpu.pipeline.system import SlamSystem

    cam = cam_mod.pinhole(fx=460.0, fy=460.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    cfg = pg.PoseGraphConfig(max_keyframes=64, skip_recent=3, top_k=4,
                             min_score=0.08, min_score_2=0.024)
    sys_ = SlamSystem(cam, pg_cfg=cfg, use_loop_closure=True)
    sys_._db_count = 40
    sys_._db_seqs = [1] * 40
    sys_.seq = 1

    verified = []

    def fake_verify(db, cand, *a, **kw):
        c = int(cand)
        verified.append(c)
        ok = c == 12  # the best-scored cand (30) fails PnP; older 12 passes
        return pg.LoopResult(
            ok=jnp.asarray(ok),
            rel_t=jnp.zeros(3), rel_yaw=jnp.asarray(0.0),
            n_inliers=jnp.asarray(25 if ok else 0), n_matches=jnp.asarray(30),
            obs_old=jnp.zeros((cfg.n_window_pts, 2)),
            match_mask=jnp.zeros(cfg.n_window_pts, bool),
            p_old=jnp.zeros(3), q_old=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
        )

    recorded = []
    sys_._jit_verify = fake_verify
    sys_._jit_record_loop = lambda db, k, c, t, y: recorded.append(
        (int(k), int(c))
    ) or db
    sys_._run_pgo = lambda: None

    # retrieval: a revisit plateau (idx 30/20/12 within rel_margin of the
    # best) above the neighbor floor; idx 5 far below the plateau ->
    # ineligible (r5 relative gating)
    cand_i = np.asarray([30, 20, 12, 5])
    cand_s = np.asarray([0.950, 0.940, 0.945, 0.60])
    floor = np.asarray(0.5)
    job = dict(stage="cand", k=39, cand_dev=None,
               fb=dict(wdesc=None), w3d=None, w_valid=None,
               w_ids=np.arange(cfg.n_window_pts),
               Rb=jnp.eye(3), tb=jnp.zeros(3),
               q_b=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
               p_kf=jnp.zeros(3), q_kf=jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    sys_._lc_jobs.append(job)
    sys_._lc_stage_cand(job, due_h=(cand_i, cand_s, floor))
    # oldest eligible (12) dispatched first
    assert verified == [12]
    assert job["stage"] == "commit"
    sys_._lc_stage_commit(job)   # 12 verifies -> loop recorded, done
    assert job.get("done")
    assert recorded == [(39, 12)]

    # second scenario: oldest (12) fails, fallback verifies 20 then 30
    verified.clear()
    recorded.clear()

    def fake_verify2(db, cand, *a, **kw):
        c = int(cand)
        verified.append(c)
        ok = c == 30
        return pg.LoopResult(
            ok=jnp.asarray(ok), rel_t=jnp.zeros(3), rel_yaw=jnp.asarray(0.0),
            n_inliers=jnp.asarray(25 if ok else 0), n_matches=jnp.asarray(30),
            obs_old=jnp.zeros((cfg.n_window_pts, 2)),
            match_mask=jnp.zeros(cfg.n_window_pts, bool),
            p_old=jnp.zeros(3), q_old=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
        )

    sys_._jit_verify = fake_verify2
    job2 = dict(job, stage="cand", done=False)
    sys_._lc_stage_cand(job2, due_h=(cand_i, cand_s, floor))
    sys_._lc_stage_commit(job2)  # 12 fails -> dispatch 20
    assert not job2.get("done")
    sys_._lc_stage_commit(job2)  # 20 fails -> dispatch 30
    assert not job2.get("done")
    sys_._lc_stage_commit(job2)  # 30 verifies
    assert job2.get("done")
    assert verified == [12, 20, 30]
    assert recorded == [(39, 30)]


def test_match_descriptors_margin_and_mutual():
    """Margin gate drops ambiguous (near-tied) matches; mutual cross-check
    drops many-to-one collisions — the precision gates verify_loop relies on
    for a PnP-viable inlier rate (r5: 50% wrong matches under the plain
    80-bit gate on self-similar imagery made 6-pt RANSAC hopeless)."""
    rng = np.random.default_rng(11)
    # build descriptors from random bits: db has a twin for each query plus
    # a near-twin distractor at controlled distance
    bits = rng.integers(0, 2, size=(6, 256)).astype(np.uint8)

    def pack(b):
        return jnp.asarray(
            np.packbits(b, axis=-1, bitorder="little").view(np.uint32)
        )

    def flip(b, n, seed):
        r = np.random.default_rng(seed)
        out = b.copy()
        for i in range(b.shape[0]):
            idx = r.choice(256, n, replace=False)
            out[i, idx] ^= 1
        return out

    da = pack(bits)
    va = jnp.ones(6, bool)
    # db rows 0..5 = twins at distance 8; rows 6..11 = distractors at 14
    db = jnp.concatenate([pack(flip(bits, 8, 1)), pack(flip(bits, 14, 2))])
    vb = jnp.ones(12, bool)

    # plain: all 6 match their twin
    idx, dist = brief_mod.match_descriptors(da, va, db, vb)
    assert int(jnp.sum(idx == jnp.arange(6))) == 6
    # margin 16: twin (8) vs distractor (~14+) margin is < 16 -> dropped
    idx_m, _ = brief_mod.match_descriptors(da, va, db, vb, margin=16)
    assert int(jnp.sum(idx_m >= 0)) < 6
    # with distant distractors the margin gate keeps the twins
    db_far = jnp.concatenate([pack(flip(bits, 8, 1)), pack(flip(bits, 90, 3))])
    idx_f, _ = brief_mod.match_descriptors(da, va, db_far, vb, margin=16)
    assert int(jnp.sum(idx_f == jnp.arange(6))) == 6
    # mutual: two queries colliding on one db row -> only the closer keeps it
    da2 = jnp.concatenate([da[:1], da[:1]])  # same query twice
    va2 = jnp.ones(2, bool)
    idx_mu, _ = brief_mod.match_descriptors(
        da2, va2, db_far, vb, mutual=True
    )
    assert int(jnp.sum(idx_mu >= 0)) <= 1


def test_loop_trajectory_scale_excitation():
    """Monocular scale is observable only through time-varying linear
    acceleration that a per-window-constant accelerometer bias cannot
    absorb.  On a constant-rate circle the centripetal acceleration is a
    near-constant body-frame vector (scale walked into the bias, r5:
    |p| 1.8 -> 12 m over 0.8 laps); the speed/radius harmonics must keep
    the body-frame LINEAR acceleration visibly time-varying."""
    from vplines_slam_tpu.utils import synthetic as syn

    traj = syn.loop_trajectory()
    ts = np.linspace(0.0, 30.0, 601)
    a_body = []
    for t in ts:
        a_w = syn.world_accel(traj, t)
        q = traj.quat(t)
        a_body.append(np.asarray(geo.quat_rotate(geo.quat_conj(q), a_w)))
    a_body = np.stack(a_body)
    # per-axis std of the gravity-free body acceleration: the bias can
    # absorb the mean, not the variation
    assert a_body.std(axis=0).max() > 0.08, a_body.std(axis=0)
    # and the trajectory stays exactly lap-periodic (revisit geometry)
    p0 = np.asarray(traj.pos(3.7))
    p1 = np.asarray(traj.pos(3.7 + 30.0))
    assert np.linalg.norm(p0 - p1) < 1e-9
