import jax
import jax.numpy as jnp
import numpy as np

from vplines_slam_tpu.models import intrinsic_calib as cal
from vplines_slam_tpu.utils import geometry as geo


def synth_views(n_views=10, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    fx, fy, cx, cy = 470.0, 465.0, 370.0, 245.0
    k1, k2, p1, p2 = -0.28, 0.07, 1e-4, -2e-4
    # 9x6 board, 0.05 m squares
    gx, gy = np.meshgrid(np.arange(9) * 0.05, np.arange(6) * 0.05)
    obj = np.stack([gx.ravel(), gy.ravel()], axis=1)
    N = len(obj)
    obj_v, img_v, mask_v = [], [], []
    for v in range(n_views):
        # strong tilts + varied depths: Zhang needs perspective diversity
        # to separate focal length from distortion
        w = rng.standard_normal(3) * [0.5, 0.5, 0.3]
        R = np.asarray(geo.so3_exp_matrix(jnp.asarray(w)))
        t = np.array([-0.2, -0.15, 0.0]) + rng.uniform(
            [-0.12, -0.1, 0.4], [0.12, 0.1, 1.0]
        )
        X = np.concatenate([obj, np.zeros((N, 1))], 1) @ R.T + t
        xn = X[:, :2] / X[:, 2:3]
        r2 = (xn**2).sum(1)
        rad = 1 + k1 * r2 + k2 * r2**2
        xd = xn * rad[:, None] + np.stack(
            [
                2 * p1 * xn[:, 0] * xn[:, 1] + p2 * (r2 + 2 * xn[:, 0] ** 2),
                p1 * (r2 + 2 * xn[:, 1] ** 2) + 2 * p2 * xn[:, 0] * xn[:, 1],
            ],
            1,
        )
        uv = xd * [fx, fy] + [cx, cy]
        if noise:
            uv = uv + rng.standard_normal(uv.shape) * noise
        obj_v.append(obj)
        img_v.append(uv)
        mask_v.append(np.ones(N, bool))
    truth = dict(fx=fx, fy=fy, cx=cx, cy=cy, k1=k1, k2=k2, p1=p1, p2=p2)
    return (
        jnp.asarray(np.stack(obj_v)),
        jnp.asarray(np.stack(img_v)),
        jnp.asarray(np.stack(mask_v)),
        truth,
    )


def test_zhang_init_close():
    obj, img, mask, truth = synth_views()
    Hs = [cal.homography_dlt(obj[v], img[v], mask[v]) for v in range(obj.shape[0])]
    fx, fy, cx, cy = cal.zhang_intrinsics(Hs)
    # distortion biases the linear init; expect ~5-10% ballpark
    assert abs(float(fx) - truth["fx"]) / truth["fx"] < 0.15
    assert abs(float(cy) - truth["cy"]) < 60


def test_full_calibration_recovers_intrinsics():
    obj, img, mask, truth = synth_views(noise=0.15)
    params, rms = cal.calibrate(obj, img, mask)
    assert float(rms) < 0.3, float(rms)
    assert abs(float(params["fx"]) - truth["fx"]) < 1.5
    assert abs(float(params["fy"]) - truth["fy"]) < 1.5
    assert abs(float(params["cx"]) - truth["cx"]) < 1.5
    assert abs(float(params["k1"]) - truth["k1"]) < 0.01
    assert abs(float(params["k2"]) - truth["k2"]) < 0.03
