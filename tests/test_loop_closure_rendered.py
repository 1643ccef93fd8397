"""Full loop-closure stack e2e on RENDERED keyframe images (CPU, slow).

Drives the complete pose-graph pipeline — rendered image -> FAST+BRIEF ->
BoW retrieval (idf-centered, neighbor floor) -> descriptor match ->
PnP-RANSAC verify -> loop edge -> 4-DoF PGO -> drift correction — over a
2-lap circuit of keyframes whose VIO poses carry synthetic drift, with
ground truth known exactly.  Unlike the through-VIO e2e this isolates the
loop-closure stack from estimator chaos: keyframe poses/3D are GT+drift by
construction, so a failure here IS a loop-closure failure.

(The chip-scale artifact driving the FULL SlamSystem is
examples/slam_accuracy.py; keyframe.cpp/pose_graph.cpp are the reference
counterparts.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import camera as cam_mod
from vplines_slam_tpu.models import pose_graph as pg_mod
from vplines_slam_tpu.utils import demo
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn

H, W = 120, 160
CAM = cam_mod.pinhole(110.0, 110.0, W / 2, H / 2, width=W, height=H)
R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
Q_IC = geo.rot_to_quat(R_BC)
P_IC = jnp.zeros(3)


@pytest.mark.slow
def test_rendered_loop_closure_corrects_drift():
    dt = jnp.float32
    traj = syn.loop_trajectory(radius=3.0)
    renderer = demo.BlobWorldRenderer(
        CAM, Q_IC.astype(dt), P_IC.astype(dt), n_pts=420, seed=4, dtype=dt
    )
    cfg = pg_mod.PoseGraphConfig(
        max_keyframes=128, n_features=96, n_window_pts=48,
        skip_recent=20, min_matches=12, pnp_thresh=8.0 / 110.0,
    )
    db = pg_mod.empty_db(cfg, dt)
    lift = lambda xy: cam_mod.lift(CAM, xy)
    extract = jax.jit(
        lambda img, wxy, wv: pg_mod.extract_keyframe_features(
            img, lift, cfg, window_xy=(wxy, wv)
        )
    )
    retrieve = jax.jit(
        lambda db, sig: pg_mod.retrieve_candidates(db, cfg, sig)
    )
    verify = jax.jit(
        lambda db, cand, wdesc, w3d, wv, p, q, key: pg_mod.verify_loop(
            db, cfg, cand, wdesc, w3d, wv, p, q, key, q_ic=Q_IC, p_ic=P_IC
        )
    )

    # window points: project world landmarks seen by this keyframe's camera
    X = renderer.X  # the renderer's landmark cloud IS the 3D structure

    def window_points(q_wb, p_wb):
        q_wc, p_wc = geo.pose_compose(q_wb, p_wb, Q_IC, P_IC)
        q_cw, p_cw = geo.pose_inverse(q_wc, p_wc)
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
        uv, vis = cam_mod.project(CAM, Xc)
        # project()'s valid is only z>0 (spaceToPlane parity) — bound to the
        # image interior explicitly, else off-image points enter the window
        # set and their BRIEF samples are border-clamped garbage (this
        # harness bug masqueraded as "BRIEF ambiguity" through r4: identical
        # revisit images self-matched at Hamming ~107)
        ok = (
            vis & (Xc[:, 2] > 0.5)
            & (uv[:, 0] >= 16) & (uv[:, 0] < W - 16)
            & (uv[:, 1] >= 16) & (uv[:, 1] < H - 16)
        )
        idx = jnp.argsort(jnp.where(ok, Xc[:, 2], 1e9))[: cfg.n_window_pts]
        return X[idx], uv[idx], ok[idx]

    wp = jax.jit(window_points)

    # 2 laps of keyframes every ~0.45 m; drift accumulates along lap 2
    n_per_lap = 42
    times = np.linspace(0.0, 60.0, 2 * n_per_lap, endpoint=False)
    rng = np.random.default_rng(0)
    drift_yaw = 0.0
    drift_t = np.zeros(3)
    loops = []
    kf_gt = []
    key = jax.random.PRNGKey(0)
    for k, t in enumerate(times):
        q_gt, p_gt = traj.quat(t).astype(dt), traj.pos(t).astype(dt)
        kf_gt.append((np.asarray(p_gt), t))
        # synthetic VIO drift: slow yaw+translation random walk
        drift_yaw += rng.normal(0.0, 0.15)  # deg per keyframe
        drift_t += rng.normal(0.0, 0.01, 3)
        Rz = geo.ypr_to_rot(jnp.asarray([drift_yaw, 0.0, 0.0], dt))
        p_vio = (Rz @ p_gt + jnp.asarray(drift_t, dt)).astype(dt)
        q_vio = geo.rot_to_quat(Rz @ geo.quat_to_rot(q_gt)).astype(dt)

        img = renderer.render(q_gt, p_gt)  # image comes from TRUE pose
        w3d_gt, wxy, wv = wp(q_gt, p_gt)
        # world points expressed in the DRIFTED frame (what VIO would store)
        w3d = (w3d_gt @ Rz.T + jnp.asarray(drift_t, dt)).astype(dt)
        fb = extract(img, wxy, wv)
        if int(db.count) >= db.p_vio.shape[0]:
            db = pg_mod.grow_db(db)
        db = pg_mod.add_keyframe(
            db, cfg, p_vio, q_vio, fb["sig"], fb["desc"], fb["kp_norm"],
            fb["kp_valid"], fb["wdesc"], w3d, wv,
        )
        cand_i, cand_s, floor = jax.device_get(retrieve(db, fb["sig"]))
        best = float(cand_s[0])
        if k > cfg.skip_recent and best > max(cfg.min_score, float(floor)):
            key, kk = jax.random.split(key)
            lr = jax.device_get(
                verify(db, jnp.asarray(int(cand_i[0])), fb["wdesc"],
                       jnp.asarray(w3d), wv, p_vio, q_vio, kk)
            )
            if bool(lr.ok):
                db = pg_mod.record_loop(
                    db, jnp.asarray(k), jnp.asarray(int(cand_i[0])),
                    jnp.asarray(lr.rel_t), jnp.asarray(lr.rel_yaw),
                )
                loops.append((k, int(cand_i[0])))

    assert len(loops) >= 3, f"expected revisit loops, got {loops}"
    # every accepted loop is a true revisit (GT distance < 1.0 m)
    for k, c in loops:
        d = np.linalg.norm(kf_gt[k][0] - kf_gt[c][0])
        assert d < 1.0, (k, c, d)

    # 4-DoF PGO pulls the drifted trajectory back onto GT
    n_kf = int(db.count)
    gt_p = np.stack([g[0] for g in kf_gt])
    err_before = np.linalg.norm(np.asarray(db.p_pgo[:n_kf]) - gt_p, axis=1)
    db2, _ = pg_mod.optimize_4dof(db, cfg)
    err_after = np.linalg.norm(np.asarray(db2.p_pgo[:n_kf]) - gt_p, axis=1)
    assert err_after[-1] < err_before[-1] * 0.5, (
        err_before[-1], err_after[-1]
    )
    R_d, t_d = jax.device_get(pg_mod.drift_correction(db2, cfg))
    assert np.isfinite(np.asarray(t_d)).all()
