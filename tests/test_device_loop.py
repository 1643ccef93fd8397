"""Device-resident frame pipeline: images+IMU in, poses out, ONE jitted scan
(pipeline/device_loop).  Initialization runs on the host engine; the scan
takes over and must track the remaining sequence accurately."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.estimator.vio import VioEngine
from vplines_slam_tpu.estimator.window import WindowConfig
from vplines_slam_tpu.models import camera as cam_mod
from vplines_slam_tpu.models import imu as imu_mod
from vplines_slam_tpu.models.feature_tracker import FeatureTrackerFrontend, TrackerConfig
from vplines_slam_tpu.pipeline.device_loop import make_device_loop
from vplines_slam_tpu.utils import evaluation as ev
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn

H, W = 240, 320
CAM = cam_mod.pinhole(200.0, 200.0, W / 2, H / 2, width=W, height=H)
R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
Q_IC = geo.rot_to_quat(R_BC)
P_IC = jnp.asarray([0.02, 0.0, 0.01])


def render(q_wb, p_wb, X, brightness, bg):
    q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))
    Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
    uv, _ = cam_mod.project(CAM, Xc)
    vis = (
        (Xc[:, 2] > 0.5)
        & (uv[:, 0] > 5) & (uv[:, 0] < W - 5)
        & (uv[:, 1] > 5) & (uv[:, 1] < H - 5)
    )
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float64), jnp.arange(W, dtype=jnp.float64),
        indexing="ij",
    )

    def blob(k, im):
        d2 = (xx - uv[k, 0]) ** 2 + (yy - uv[k, 1]) ** 2
        return im + vis[k] * brightness[k] * jnp.exp(-d2 / 4.5)

    return jnp.clip(jax.lax.fori_loop(0, X.shape[0], blob, bg), 0.0, 1.0)


@pytest.mark.slow
def test_device_loop_tracks_after_host_init():
    rng = np.random.default_rng(0)
    traj = syn.figure8_trajectory(radius=1.2, ypr_amp=(12.0, 5.0, 4.0))
    n_pts = 500
    X = syn.scatter_landmarks(n_pts, seed=4, box=((-4, 4), (-4, 4), (-1, 2.5)))
    brightness = jnp.asarray(rng.uniform(0.35, 0.9, n_pts))
    from tests.test_frontend_ops import smooth_texture

    bg = smooth_texture(rng, H=H, W=W) * 0.03

    duration, frame_hz, imu_hz = 4.0, 10, 200
    frame_times = np.arange(0.0, duration, 1.0 / frame_hz)
    imu_times = np.arange(0.0, duration + 1e-9, 1.0 / imu_hz)
    accs, gyrs = syn.imu_samples(traj, jnp.asarray(imu_times))
    accs, gyrs = np.asarray(accs), np.asarray(gyrs)

    cfg = WindowConfig(max_points=64, max_lines=4, max_imu=32, init_min_corres=12)
    tcfg = TrackerConfig(max_features=64, min_dist=12, equalize=False, quality=0.003)
    fe = FeatureTrackerFrontend(CAM, tcfg, dtype=jnp.float64)
    eng = VioEngine(cfg, imu_mod.default_params(), q_ic=Q_IC, p_ic=P_IC)

    rfun = jax.jit(lambda q, p: render(q, p, X, brightness, bg))
    imgs = [rfun(traj.quat(t), traj.pos(t)) for t in frame_times]

    # ---- phase 1: host loop until initialized -----------------------------
    imu_idx = 0
    switch = None
    for fi, ft in enumerate(frame_times):
        while imu_idx < len(imu_times) and imu_times[imu_idx] <= ft + 1e-9:
            eng.add_imu(imu_times[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        feats = fe.process(ft, imgs[fi])
        eng.add_frame(ft, feats.ids, feats.rays)
        if eng.initialized:
            switch = fi + 1
            break
    assert switch is not None, "host init never happened"
    assert switch < len(frame_times) - 8, "need frames left for the scan"

    # ---- phase 2: device-resident scan over the remaining frames ----------
    T = len(frame_times) - switch
    batches = []
    keys = []
    key = jax.random.PRNGKey(7)
    for fi in range(switch, len(frame_times)):
        ft = frame_times[fi]
        while imu_idx < len(imu_times) and imu_times[imu_idx] <= ft + 1e-9:
            eng.add_imu(imu_times[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        batches.append(eng._pack_imu(float(ft)))
        key, k = jax.random.split(key)
        keys.append(k)
    imu_stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    imgs_dev = jnp.stack([imgs[fi] for fi in range(switch, len(frame_times))])
    dts = jnp.full((T,), 1.0 / frame_hz, jnp.float64)

    loop = make_device_loop(CAM, tcfg, cfg, eng.params)
    carry = loop.init_carry(fe.state, eng.state, eng.data)
    carry, outs = loop.run(carry, imgs_dev, imu_stacked, dts, jnp.stack(keys))
    p, q, v, is_kf, failure, cost = outs

    assert not bool(np.asarray(failure).any()), "failure flagged in scan"
    gt_p = np.stack([np.asarray(traj.pos(frame_times[fi]))
                     for fi in range(switch, len(frame_times))])
    ate = ev.ate_rmse(np.asarray(p), gt_p, align=True)
    # the HOST loop on these exact frames scores ~0.17 m (init scale is still
    # settling on this short blob sequence); the scan must match that class —
    # it runs the identical track_step, verified pose-for-pose during bring-up
    assert ate < 0.25, f"device-loop ATE {ate:.4f} m"
    assert np.isfinite(np.asarray(cost)).all()
