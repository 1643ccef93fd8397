"""YAML configuration: device profiles -> module configs.

Parity with the reference's two-level config (ROS params + cv::FileStorage
yaml, vins_estimator/src/parameters.cpp:58-154 and
feature_tracker/src/parameters.cpp): one yaml file describes the camera,
IMU noise, extrinsics, front-end knobs and factor weights; this loader
produces the typed NamedTuple configs the modules take.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
import yaml

from ..estimator.window import WindowConfig
from ..factors import residuals as res
from ..models import camera as cam_mod
from ..models import imu as imu_mod
from ..models.feature_tracker import TrackerConfig
from ..models.line_tracker import LineTrackerConfig
from ..utils.geometry import rot_to_quat


class SystemProfile(NamedTuple):
    camera: cam_mod.CameraModel
    imu_params: imu_mod.ImuParams
    q_ic: jnp.ndarray
    p_ic: jnp.ndarray
    window: WindowConfig
    tracker: TrackerConfig
    lines: LineTrackerConfig | None
    td: float
    name: str
    estimate_extrinsic: int = 1
    estimate_td: bool = False
    pose_graph: object = None  # PoseGraphConfig | None
    use_loop_closure: bool = True
    use_feature_selector: bool = False
    selector: object = None  # SelectorConfig | None
    use_global_fusion: bool = False
    # landmark-sharded distributed BA (parallel/dist_ba): number of mesh
    # devices on the 'f' axis; 0 = single-chip solve.  See
    # configs/mapping_multichip.yaml and VioEngine(mesh=...).
    landmark_mesh_devices: int = 0

    def make_mesh(self):
        """Build the landmark mesh this profile asks for (None if off)."""
        if not self.landmark_mesh_devices:
            return None
        import jax
        import numpy as np
        from jax.sharding import Mesh

        n = self.landmark_mesh_devices
        if len(jax.devices()) < n:
            raise RuntimeError(
                f"profile {self.name} wants a {n}-device landmark mesh, "
                f"{len(jax.devices())} devices available"
            )
        return Mesh(np.asarray(jax.devices()[:n]), ("f",))


def load_profile(path, dtype=jnp.float64) -> SystemProfile:
    with open(path) as f:
        y = yaml.safe_load(f)

    c = y["camera"]
    kind = c.get("model", "pinhole")
    if kind == "pinhole":
        cam = cam_mod.pinhole(
            c["fx"], c["fy"], c["cx"], c["cy"],
            *(c.get("distortion", [0, 0, 0, 0])[:4]),
            width=c.get("width", 752), height=c.get("height", 480),
        )
    elif kind in ("kannala_brandt", "equidistant"):
        cam = cam_mod.equidistant(
            c["fx"], c["fy"], c["cx"], c["cy"],
            *(c.get("distortion", [0, 0, 0, 0])[:4]),
            width=c.get("width", 512), height=c.get("height", 512),
        )
    elif kind == "mei":
        d = c.get("distortion", [0, 0, 0, 0])
        cam = cam_mod.mei(
            c["fx"], c["fy"], c["cx"], c["cy"], c["xi"], *d[:4],
            width=c.get("width", 848), height=c.get("height", 800),
        )
    else:
        raise ValueError(f"unknown camera model {kind}")

    n = y.get("imu", {})
    imu_params = imu_mod.ImuParams(
        acc_n=jnp.asarray(n.get("acc_n", 0.08), dtype),
        gyr_n=jnp.asarray(n.get("gyr_n", 0.004), dtype),
        acc_w=jnp.asarray(n.get("acc_w", 4e-5), dtype),
        gyr_w=jnp.asarray(n.get("gyr_w", 2e-6), dtype),
        g=jnp.asarray([0.0, 0.0, n.get("g_norm", 9.81007)], dtype),
    )

    e = y.get("extrinsic", {})
    R_bc = jnp.asarray(e.get("R_bc", np.eye(3).tolist()), dtype)
    q_ic = rot_to_quat(R_bc)
    p_ic = jnp.asarray(e.get("p_bc", [0.0, 0.0, 0.0]), dtype)

    w = y.get("estimator", {})
    window = WindowConfig(
        max_points=w.get("max_points", 128),
        max_lines=w.get("max_lines", 32),
        max_imu=w.get("max_imu", 64),
        g_norm=n.get("g_norm", 9.81007),
        min_parallax=w.get("keyframe_parallax", 10.0) / 460.0,
        ba_iters=w.get("max_num_iterations", 8),
        line_sqrt_info=w.get("line_factor", res.LINE_SQRT_INFO),
        vp_sqrt_info=w.get("vp_factor", 10.0),
        line_min_obs=w.get("line_min_obs", 5),
    )

    t = y.get("frontend", {})
    tracker = TrackerConfig(
        max_features=t.get("max_cnt", 150),
        min_dist=t.get("min_dist", 30),
        f_threshold=t.get("F_threshold", 1.0),
        equalize=bool(t.get("equalize", True)),
        fisheye=bool(t.get("fisheye", False)),
    )

    lines = None
    lf = y.get("line_frontend")
    if lf is not None:
        from ..ops.lines import LineDetectConfig
        from ..ops.vp import VPConfig, reference_vp_config

        vp_cfg = (
            reference_vp_config()
            if lf.get("vp_resolution", "fast") == "reference"
            else VPConfig()
        )
        lines = LineTrackerConfig(
            max_lines=lf.get("max_lines", 64),
            max_h=lf.get("max_h_lines", 40),
            max_v=lf.get("max_v_lines", 40),
            detect=LineDetectConfig(
                min_len=float(lf.get("min_line_length", 30)),
                fit_err=float(lf.get("line_fit_err", 1.5)),
            ),
            use_vp=bool(lf.get("use_vp", True)),
            vp=vp_cfg,
        )

    pg = y.get("pose_graph", {})
    from ..models.pose_graph import PoseGraphConfig

    pg_cfg = PoseGraphConfig(
        n_features=pg.get("n_features", 500),  # reference keyframe.cpp:87
        skip_cnt=pg.get("skip_cnt", 0),
        skip_dis=pg.get("skip_dis", 0.0),
        loop_edge_weight=pg.get("loop_edge_weight", 1.0),
    )

    s = y.get("selector", {})
    from ..models.selector import SelectorConfig

    sel_cfg = SelectorConfig(
        max_features=s.get("max_features", 30),
        init_threshold=s.get("init_threshold", 30),
    )

    return SystemProfile(
        camera=cam, imu_params=imu_params, q_ic=q_ic, p_ic=p_ic,
        window=window, tracker=tracker, lines=lines,
        td=float(y.get("td", 0.0)),
        name=y.get("name", os.path.basename(path)),
        estimate_extrinsic=int(y.get("estimate_extrinsic", 1)),
        estimate_td=bool(y.get("estimate_td", False)),
        pose_graph=pg_cfg,
        use_loop_closure=bool(pg.get("loop_closure", True)),
        use_feature_selector=bool(s.get("use_feature_selector", False)),
        selector=sel_cfg,
        use_global_fusion=bool(y.get("global_fusion", {}).get("enabled", False)),
        landmark_mesh_devices=int(
            y.get("parallel", {}).get("landmark_mesh_devices", 0)
        ),
    )
