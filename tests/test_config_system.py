import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import camera as cam_mod
from vplines_slam_tpu.utils.config import load_profile


def test_euroc_profile_loads():
    p = load_profile("/root/repo/configs/euroc.yaml")
    assert p.camera.kind == cam_mod.PINHOLE
    assert abs(float(p.camera.fx) - 461.6) < 1e-9
    assert p.lines is not None
    assert p.window.max_points == 128
    # extrinsic rotation is a unit quaternion close to a 90° yaw-ish mount
    assert abs(float(jnp.linalg.norm(p.q_ic)) - 1) < 1e-9
    assert float(p.imu_params.acc_n) == 0.08


def test_tum_profile_loads():
    p = load_profile("/root/repo/configs/tum_vi.yaml")
    assert p.camera.kind == cam_mod.EQUIDISTANT
    assert p.lines is None
    assert abs(float(p.imu_params.g[2]) - 9.80766) < 1e-9


def test_profile_builds_system():
    """The profile must be directly consumable by the SlamSystem ctor."""
    from vplines_slam_tpu.models import pose_graph as pg_mod
    from vplines_slam_tpu.pipeline.system import SlamSystem

    p = load_profile("/root/repo/configs/euroc.yaml")
    sys_ = SlamSystem(
        p.camera,
        window_cfg=p.window._replace(max_points=32, max_lines=4, max_imu=8),
        tracker_cfg=p.tracker._replace(max_features=32),
        pg_cfg=pg_mod.PoseGraphConfig(max_keyframes=16, n_features=32, n_window_pts=16),
        q_ic=p.q_ic,
        p_ic=p.p_ic,
        dtype=jnp.float64,
    )
    sys_.add_imu(0.0, np.array([0.0, 0.0, 9.81]), np.zeros(3))
    # one frame through the whole image path (fill phase, no crash)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (480, 752)))
    out = sys_.add_image(0.05, img)
    assert out is None  # still filling the window
    assert sys_.vio.frame_count == 1


def test_device_profiles_load():
    """All shipped device profiles parse and carry reference defaults
    (t265 MEI, d455 pinhole, 527 GNSS rig — config/{t265,d455,527} parity)."""
    t = load_profile("/root/repo/configs/t265.yaml")
    assert t.camera.kind == cam_mod.MEI
    assert t.camera.width == 848 and t.camera.height == 800
    assert t.estimate_extrinsic == 1
    assert t.pose_graph.n_features == 500
    assert t.window.line_min_obs == 5

    d = load_profile("/root/repo/configs/d455.yaml")
    assert d.camera.kind == cam_mod.PINHOLE
    assert d.estimate_extrinsic == 0
    assert float(d.window.vp_sqrt_info) == 1.0

    g = load_profile("/root/repo/configs/gnss_527.yaml")
    assert g.use_global_fusion and not g.use_loop_closure
    assert float(g.imu_params.acc_n) == 0.2

    e = load_profile("/root/repo/configs/euroc.yaml")
    assert e.pose_graph.loop_edge_weight == 1.0
    assert e.pose_graph.n_features == 500
    assert e.window.line_min_obs == 5
