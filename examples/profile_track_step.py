#!/usr/bin/env python
"""Per-stage on-device timing of the full device-loop frame step:
point front-end, line front-end, and the VIO track_step decomposed
(preintegrate/propagate/ingest, triangulation, settle, solve, outliers,
marginalize+slide).  Times K chained iterations inside one jitted scan
(amortizes the host dispatch floor; see docs/PERF.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VPL_CPU"):
    from vplines_slam_tpu.utils.hostplatform import force_cpu

    force_cpu()

import jax
import jax.numpy as jnp
import numpy as np

from vplines_slam_tpu.estimator import vio as vio_mod
from vplines_slam_tpu.estimator import window as win_mod
from vplines_slam_tpu.models import camera as cam_mod
from vplines_slam_tpu.models import feature_tracker as ft_mod
from vplines_slam_tpu.models import line_tracker as lt_mod
from vplines_slam_tpu.models import imu as imu_mod
from vplines_slam_tpu.utils import demo
from vplines_slam_tpu.ops.image import bilinear_sample, gaussian_blur

K = 20


def timeit(fn, n=6):
    def rb(r):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0])).ravel()[:1]

    r = fn(0)
    rb(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = fn(i)
    rb(r)
    return (time.time() - t0) / n


def scan_time(name, body, carry0, xs=None):
    @jax.jit
    def many(c):
        return jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=K)[0]

    t = timeit(lambda i: many(jax.tree_util.tree_map(
        lambda a: a + (i * 1e-6 if jnp.issubdtype(a.dtype, jnp.floating) else 0),
        carry0)))
    print(f"{name}: {t * 1e3 / K:.2f} ms")
    return t / K


def main():
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    H, W = 480, 752
    cam = cam_mod.pinhole(460.0, 460.0, W / 2, H / 2, width=W, height=H)
    img = np.zeros((H, W), np.float32)
    for o in range(5):
        l = rng.standard_normal((H // (2**o) + 1, W // (2**o) + 1))
        img += np.kron(l, np.ones((2**o, 2**o)))[:H, :W] / (o + 1)
    img = (img - img.min()) / (img.max() - img.min())
    img0 = gaussian_blur(jnp.asarray(0.25 + 0.5 * img, dtype), 5, 0.8)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype),
                          indexing="ij")
    img1 = bilinear_sample(img0, jnp.stack([xx + 2.0, yy - 1.5], -1))

    # --- point front-end step ---
    tcfg = ft_mod.TrackerConfig(max_features=96, min_dist=12, equalize=False,
                                quality=0.003)
    fe0 = ft_mod.init_state(tcfg, H, W, dtype)
    key = jax.random.PRNGKey(0)
    fe1, _ = jax.jit(lambda s: ft_mod.step(s, img0, cam, tcfg, 0.1, key))(fe0)

    def pt_body(c):
        s, k = c
        k1, k2 = jax.random.split(k)
        s, out = ft_mod.step(s, img1 + k[0] * 1e-9, cam, tcfg, 0.1, k1)
        return (s, k2)

    scan_time("point frontend step", pt_body, (fe1, key))

    # --- line front-end step ---
    lcfg = lt_mod.LineTrackerConfig(max_lines=32)
    lfe = lt_mod.LineTrackerFrontend(cam, lcfg, dtype=dtype)
    lfe.process(0.0, img0)
    ideal = lfe.ideal

    def ln_body(c):
        s, k = c
        k1, k2 = jax.random.split(k)
        s, out = lt_mod.step(s, img1 + k[0] * 1e-9, ideal, lcfg, k1)
        return (s, k2)

    scan_time("line frontend step", ln_body, (lfe.state, key))

    # --- VIO window stages ---
    cfg = win_mod.WindowConfig(max_points=96, max_lines=16, max_imu=32)
    params = imu_mod.default_params(dtype)
    state, data, params = demo.synthetic_window(
        cfg, dtype=dtype, n_landmarks=250, imu_per_interval=20, perturb=0.01,
        n_lines=30,
    )

    def tp_body(c):
        s, d = c
        d = win_mod.triangulate_points(s, d, cfg)
        return (s, d)

    scan_time("triangulate_points", tp_body, (state, data))

    def tl_body(c):
        s, d = c
        d = win_mod.triangulate_lines(s, d, cfg)
        return (s, d)

    scan_time("triangulate_lines", tl_body, (state, data))

    def settle_body(c):
        s, d = c
        d = win_mod.settle_lines(s, d, cfg)
        return (s, d)

    scan_time("settle_lines", settle_body, (state, data))

    def rej_body(c):
        s, d = c
        d = win_mod.reject_outliers(s, d, cfg)
        return (s, d)

    scan_time("reject_outliers", rej_body, (state, data))

    def solve_body(c):
        s, d = c
        s, d, _ = win_mod.solve_window(s, d, cfg, params)
        return (s, d)

    scan_time("solve_window (8 it)", solve_body, (state, data))

    from vplines_slam_tpu.estimator import slide as slide_mod
    from vplines_slam_tpu.estimator.vio import track_step

    def marg_body(c):
        s, d = c
        from vplines_slam_tpu.estimator.slide import marginalize_old, slide_window_old
        prior = marginalize_old(s, d, cfg, params)
        s2, d2 = slide_window_old(s, d, cfg, params, prior)
        return (s, d2._replace(prior=d.prior, prior_state=d.prior_state))

    scan_time("marginalize+slide", marg_body, (state, data))

    # --- full track_step ---
    I = cfg.max_imu
    imu_batch = (
        jnp.full((I,), 0.005, dtype),
        jnp.tile(jnp.asarray([0.0, 0.0, 9.81], dtype), (I + 1, 1)),
        jnp.zeros((I + 1, 3), dtype),
        jnp.ones((I,), bool),
        jnp.asarray(True),
    )
    pt_ids = jnp.arange(cfg.max_points, dtype=jnp.int32)
    pt_rays = jnp.zeros((cfg.max_points, 3), dtype).at[:, 2].set(1.0)
    L = cfg.max_lines
    ln_args = (
        jnp.arange(L, dtype=jnp.int32),
        jnp.zeros((L, 4), dtype),
        jnp.zeros((L, 3), dtype).at[:, 2].set(1.0),
        jnp.zeros((L,), bool),
    )

    def ts_body(c):
        s, d = c
        s, d, out = track_step(s, d, pt_ids, pt_rays, ln_args, imu_batch,
                               cfg, params, True)
        return (s, d)

    scan_time("track_step full (lines on)", ts_body, (state, data))

    def ts_body_pts(c):
        s, d = c
        s, d, out = track_step(s, d, pt_ids, pt_rays, (), imu_batch,
                               cfg, params, False)
        return (s, d)

    scan_time("track_step (points only)", ts_body_pts, (state, data))


if __name__ == "__main__":
    main()
