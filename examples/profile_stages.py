#!/usr/bin/env python
"""Per-stage on-chip profile of the full frame pipeline (r03 perf work).

Times each jitted stage independently on the real chip with the bench's
chained-dispatch + single-readback discipline, then prints a table:
  image ops (clahe, remap), point KLT step, line front-end sub-stages
  (detect / match / VP), and the VIO track_step sub-stages (triangulate
  points/lines, settle, reject, solve_window, slide/marg remainder).

Reference comparison: the reference budgets 40 ms solver + 10 Hz front-end
(config/euroc/euroc_config.yaml:48-56).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_texture, timeit
    from vplines_slam_tpu.estimator import vio as vio_mod
    from vplines_slam_tpu.estimator import window as win_mod
    from vplines_slam_tpu.estimator.window import WindowConfig
    from vplines_slam_tpu.models import camera as cam_mod
    from vplines_slam_tpu.models import feature_tracker as ft_mod
    from vplines_slam_tpu.models import imu as imu_mod
    from vplines_slam_tpu.models import line_tracker as lt_mod
    from vplines_slam_tpu.ops import line_match as lmatch_mod
    from vplines_slam_tpu.ops import lines as lines_mod
    from vplines_slam_tpu.ops import vp as vp_mod
    from vplines_slam_tpu.ops.image import clahe
    from vplines_slam_tpu.utils import geometry as geo
    from vplines_slam_tpu.utils import synthetic as syn

    dtype = jnp.float32
    H, W = 480, 752
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.stack([make_texture(rng, H, W, grid=True) for _ in range(8)]), dtype
    )
    CAM = cam_mod.pinhole(460.0, 460.0, W / 2, H / 2, width=W, height=H)

    rows = []

    def bench(name, fn, n=20):
        ms = timeit(fn, n=n) * 1e3
        rows.append((name, ms))
        print(f"  {name:36s} {ms:8.2f} ms", flush=True)

    # ---- image ops -------------------------------------------------------
    jc = jax.jit(clahe)
    bench("clahe 480x752", lambda i: jc(imgs[i % 8]))

    # ---- point front-end -------------------------------------------------
    tcfg = ft_mod.TrackerConfig(max_features=96, min_dist=12, equalize=False,
                                quality=0.003)
    fe0 = ft_mod.init_state(tcfg, H, W, dtype=dtype)
    fstep = jax.jit(lambda s, img, key: ft_mod.step(s, img, CAM, tcfg, 0.1, key))
    fe1, _ = fstep(fe0, imgs[0], jax.random.PRNGKey(0))
    bench("point FE step (KLT+detect)",
          lambda i: fstep(fe1, imgs[i % 8], jax.random.PRNGKey(i))[0])

    # ---- line front-end sub-stages --------------------------------------
    lcfg = lt_mod.LineTrackerConfig(max_lines=32)
    det_cfg = lcfg.detect._replace(max_lines=32)
    jdet = jax.jit(lambda img: lines_mod.detect_lines(img, det_cfg))
    segs, lens, valid = jdet(imgs[0])
    bench("EDLine detect", lambda i: jdet(imgs[i % 8]))

    jmatch = jax.jit(
        lambda a, b, s, v, s2, v2: lmatch_mod.match_lines(a, b, s, v, s2, v2, lcfg.match)
    )
    segs2, lens2, valid2 = jdet(imgs[1])
    bench("line match (anchor-KLT+vote)",
          lambda i: jmatch(imgs[i % 8], imgs[(i + 1) % 8], segs, valid, segs2, valid2))

    jvp = jax.jit(
        lambda s, v, key: vp_mod.detect_vps(s, v, CAM.fx, CAM.cx, CAM.cy, key, lcfg.vp)
    )
    bench("VP detect", lambda i: jvp(segs, valid, jax.random.PRNGKey(i)))

    ln0 = lt_mod.init_state(lcfg, H, W, dtype=dtype)
    lstep = jax.jit(lambda s, img, key: lt_mod.step(s, img, CAM, lcfg, key))
    ln1, _ = lstep(ln0, imgs[0], jax.random.PRNGKey(0))
    bench("line FE step TOTAL",
          lambda i: lstep(ln1, imgs[i % 8], jax.random.PRNGKey(i))[0])

    # ---- VIO sub-stages --------------------------------------------------
    from vplines_slam_tpu.utils import demo

    cfg = WindowConfig(max_points=96, max_lines=16, max_imu=32)
    state, data, params = demo.synthetic_window(
        cfg, dtype=dtype, n_landmarks=200, n_lines=16, imu_per_interval=20
    )

    def tstage(name, fn):
        jf = jax.jit(fn)
        r = jf(state, data)
        jax.block_until_ready(r)
        bench(name, lambda i: jf(state, data._replace(
            pt_obs=data.pt_obs + 1e-6 * i)))

    tstage("triangulate_points",
           lambda s, d: win_mod.triangulate_points(s, d._replace(
               pt_solved=jnp.zeros_like(d.pt_solved)), cfg))
    tstage("triangulate_lines",
           lambda s, d: win_mod.triangulate_lines(s, d._replace(
               ln_solved=jnp.zeros_like(d.ln_solved)), cfg))
    tstage("settle_lines (8 GN iters)",
           lambda s, d: win_mod.settle_lines(s, d, cfg))
    tstage("reject_outliers", lambda s, d: win_mod.reject_outliers(s, d, cfg))
    jsolve = jax.jit(lambda s, d: win_mod.solve_window(s, d, cfg, params))
    r = jsolve(state, data)
    jax.block_until_ready(r)
    bench("solve_window (8 LM iters)",
          lambda i: jsolve(state, data._replace(pt_obs=data.pt_obs + 1e-6 * i)))

    from vplines_slam_tpu.estimator.slide import (
        marginalize_old, slide_window_old, slide_window_new,
    )

    def kf_slide(s, d):
        prior = marginalize_old(s, d, cfg, params)
        return slide_window_old(s, d, cfg, params, prior)

    jkf = jax.jit(kf_slide)
    jax.block_until_ready(jkf(state, data))
    bench("marginalize+slide (keyframe)",
          lambda i: jkf(state, data._replace(pt_obs=data.pt_obs + 1e-6 * i)))
    jnkf = jax.jit(lambda s, d: slide_window_new(s, d, cfg, params))
    jax.block_until_ready(jnkf(state, data))
    bench("slide (non-keyframe)",
          lambda i: jnkf(state, data._replace(pt_obs=data.pt_obs + 1e-6 * i)))

    total = sum(ms for _, ms in rows)
    print("\nsummary:")
    for name, ms in rows:
        print(f"  {name:36s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
