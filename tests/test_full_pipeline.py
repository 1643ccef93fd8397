"""Full pipeline smoke: rendered images -> front-end -> VIO.

Renders a synthetic world (gaussian-blob landmarks over smooth texture) from
ground-truth camera poses and runs the REAL image pipeline: KLT front-end
produces the tracks the estimator consumes — no ground-truth ids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.estimator.vio import VioEngine
from vplines_slam_tpu.estimator.window import WindowConfig
from vplines_slam_tpu.models import camera as cam_mod
from vplines_slam_tpu.models import imu as imu_mod
from vplines_slam_tpu.models.feature_tracker import FeatureTrackerFrontend, TrackerConfig
from vplines_slam_tpu.utils import evaluation as ev
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn

H, W = 240, 320
CAM = cam_mod.pinhole(200.0, 200.0, W / 2, H / 2, width=W, height=H)
R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
Q_IC = geo.rot_to_quat(R_BC)
P_IC = jnp.asarray([0.02, 0.0, 0.01])


def render_frame(q_wb, p_wb, X, brightness, bg):
    """Gaussian blobs at the projections of world points over a dim texture."""
    q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))
    Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
    uv, _ = cam_mod.project(CAM, Xc)
    vis = (Xc[:, 2] > 0.5) & (uv[:, 0] > 5) & (uv[:, 0] < W - 5) & (uv[:, 1] > 5) & (uv[:, 1] < H - 5)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float64), jnp.arange(W, dtype=jnp.float64), indexing="ij")

    def blob(img, k):
        d2 = (xx - uv[k, 0]) ** 2 + (yy - uv[k, 1]) ** 2
        return img + vis[k] * brightness[k] * jnp.exp(-d2 / (2.0 * 2.25))

    img = jax.lax.fori_loop(0, X.shape[0], lambda k, im: blob(im, k), bg)
    return jnp.clip(img, 0.0, 1.0)


@pytest.mark.slow
def test_images_to_trajectory():
    rng = np.random.default_rng(0)
    traj = syn.figure8_trajectory(radius=1.2, ypr_amp=(12.0, 5.0, 4.0))
    n_pts = 600
    X = syn.scatter_landmarks(n_pts, seed=4, box=((-4, 4), (-4, 4), (-1, 2.5)))
    brightness = jnp.asarray(rng.uniform(0.35, 0.9, n_pts))
    from tests.test_frontend_ops import smooth_texture

    # background must be negligible: it is screen-fixed, not world content —
    # any trackable texture in it would (correctly) be culled by F-RANSAC
    bg = smooth_texture(rng, H=H, W=W) * 0.03

    duration, frame_hz, imu_hz = 3.2, 10, 200
    frame_times = np.arange(0.0, duration, 1.0 / frame_hz)
    imu_times = np.arange(0.0, duration + 1e-9, 1.0 / imu_hz)
    accs, gyrs = syn.imu_samples(traj, jnp.asarray(imu_times))
    accs, gyrs = np.asarray(accs), np.asarray(gyrs)

    cfg = WindowConfig(max_points=96, max_lines=4, max_imu=32,
                       init_min_corres=12)
    fe = FeatureTrackerFrontend(
        CAM, TrackerConfig(max_features=96, min_dist=12, equalize=False, quality=0.003),
        dtype=jnp.float64,
    )
    eng = VioEngine(cfg, imu_mod.default_params(), q_ic=Q_IC, p_ic=P_IC)

    render = jax.jit(lambda q, p: render_frame(q, p, X, brightness, bg))
    est_t, est_p = [], []
    imu_idx = 0
    for ft in frame_times:
        while imu_idx < len(imu_times) and imu_times[imu_idx] <= ft + 1e-9:
            eng.add_imu(imu_times[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        img = render(traj.quat(ft), traj.pos(ft))
        feats = fe.process(ft, img)
        out = eng.add_frame(ft, feats.ids, feats.rays)
        if out is not None and eng.initialized:
            est_t.append(ft)
            est_p.append(np.asarray(out.p))

    assert eng.initialized, "never initialized from image tracks"
    assert len(est_p) >= 12
    gt = np.stack([np.asarray(traj.pos(t)) for t in est_t])
    ate = ev.ate_rmse(np.stack(est_p), gt)
    # image-pipeline accuracy: subpixel KLT + real detection noise
    assert ate < 0.12, f"ATE {ate*100:.1f} cm"
