"""Fisheye mask (parameters.cpp:71-83) + stats stream (printStatistics
parity, utils/stats.py) behavior."""

import jax
import jax.numpy as jnp
import numpy as np


def test_fisheye_mask_confines_detection():
    from vplines_slam_tpu.models import camera as cam_mod
    from vplines_slam_tpu.models import feature_tracker as ft

    H, W = 120, 160
    cam = cam_mod.pinhole(200.0, 200.0, W / 2, H / 2, width=W, height=H)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (H, W)))
    mask = ft.circular_fisheye_mask(H, W, radius=40.0, dtype=img.dtype)
    cfg = ft.TrackerConfig(max_features=64, min_dist=8)
    st = ft.init_state(cfg, H, W, img.dtype)
    st, out = ft.step(st, img, cam, cfg, 0.1, jax.random.PRNGKey(0),
                      fisheye_mask=mask)
    xy = np.asarray(out.xy)[np.asarray(out.valid)]
    r = np.hypot(xy[:, 0] - (W - 1) / 2, xy[:, 1] - (H - 1) / 2)
    assert len(xy) > 10
    assert r.max() <= 41.0, r.max()

    # frontend honors cfg.fisheye by generating the circle mask
    fe = ft.FeatureTrackerFrontend(cam, cfg._replace(fisheye=True))
    assert fe.fisheye_mask is not None


def test_stats_stream_and_timings():
    from vplines_slam_tpu.utils.stats import Statistics, TicToc

    tt = TicToc()
    assert tt.toc() >= 0.0
    st = Statistics(print_every=2)
    with st.timers.time("frontend"):
        pass
    st.update(np.zeros(3), True, False, ba_cost=1.5)
    st.update(np.ones(3), False, True, ba_cost=0.5)
    s = st.summary(p_ic=np.zeros(3), q_ic=np.asarray([1.0, 0, 0, 0]), td=0.004)
    assert "path=1.73m" in s and "kf=1" in s and "loops=1" in s
    assert "td=4.00ms" in s and "frontend=" in s


def test_tum_profile_has_fisheye():
    from vplines_slam_tpu.utils.config import load_profile

    p = load_profile("/root/repo/configs/tum_vi.yaml")
    assert p.tracker.fisheye
