#!/usr/bin/env python
"""Benchmark: tracking + sliding-window BA frames/s on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference is designed for 10 Hz real-time operation
(front-end FREQ=10, euroc_config.yaml:48; solver budget 40 ms + front-end
=> ~10 fps end-to-end on its desktop CPU).  vs_baseline = fps / 10.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 10.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vplines_slam_tpu.estimator import window as win_mod
    from vplines_slam_tpu.ops import corners as corners_mod
    from vplines_slam_tpu.ops import klt as klt_mod
    from vplines_slam_tpu.utils import demo

    dtype = jnp.float32

    # ---- stage 1: front-end tracking (KLT 150 pts @ 752x480 + top-up) -----
    rng = np.random.default_rng(0)
    H, W = 480, 752
    img = np.zeros((H, W), np.float32)
    for o in range(5):
        l = rng.standard_normal((H // (2**o) + 1, W // (2**o) + 1))
        img += np.kron(l, np.ones((2**o, 2**o)))[:H, :W] / (o + 1)
    img = (img - img.min()) / (img.max() - img.min())
    img0 = jnp.asarray(img, dtype)
    from vplines_slam_tpu.ops.image import bilinear_sample, gaussian_blur

    img0 = gaussian_blur(img0, 5, 1.0)
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    img1 = bilinear_sample(img0, jnp.stack([xx + 2.3, yy - 1.7], -1))
    pts = jnp.asarray(rng.uniform([30, 30], [W - 30, H - 30], size=(150, 2)), dtype)

    kcfg = klt_mod.KLTConfig(win=21, levels=3, iters=10)

    @jax.jit
    def frontend(img0, img1, pts):
        pts1, ok, _ = klt_mod.track(img0, img1, pts, kcfg)
        xy, score, valid = corners_mod.detect(
            img1, max_corners=64, min_dist=30, existing_xy=pts1, existing_mask=ok
        )
        return pts1, ok, xy, valid

    # ---- stage 2: sliding-window BA ---------------------------------------
    cfg = win_mod.WindowConfig(max_points=128, max_lines=16, max_imu=32)
    state, data, params = demo.synthetic_window(
        cfg, dtype=dtype, n_landmarks=300, imu_per_interval=20, perturb=0.01
    )

    @jax.jit
    def ba_step(state, data):
        state2, data2, out = win_mod.solve_window(
            state, data, cfg, params, num_iters=8
        )
        return state2, data2, out.cost

    # ---- warmup (compile) --------------------------------------------------
    r = frontend(img0, img1, pts)
    jax.block_until_ready(r)
    s2, d2, c = ba_step(state, data)
    jax.block_until_ready(c)

    # ---- per-stage timing (stderr) ----------------------------------------
    n_frames = 30
    t0 = time.time()
    for _ in range(n_frames):
        r = frontend(img0, img1, pts)
    jax.block_until_ready(r)
    t_fe = (time.time() - t0) / n_frames
    t0 = time.time()
    for _ in range(n_frames):
        s2, d2, c = ba_step(state, data)
    jax.block_until_ready(c)
    t_ba = (time.time() - t0) / n_frames
    print(
        f"stage timing: frontend {t_fe*1e3:.1f} ms, BA {t_ba*1e3:.1f} ms",
        file=sys.stderr,
    )

    # ---- timed loop --------------------------------------------------------
    t0 = time.time()
    for _ in range(n_frames):
        r = frontend(img0, img1, pts)
        s2, d2, c = ba_step(state, data)
    jax.block_until_ready((r, c))
    wall = time.time() - t0
    fps = n_frames / wall

    print(
        json.dumps(
            {
                "metric": "tracking+BA frames/s (1 chip, 150 pts KLT + 11-frame window BA 8 LM iters)",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
