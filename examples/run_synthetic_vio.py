#!/usr/bin/env python
"""Run the monocular VIO end-to-end on a synthetic sequence and report ATE.

Usage:
  python examples/run_synthetic_vio.py [--platform cpu|tpu] [--duration 6]
         [--f32] [--out traj.tum]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--noise", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # On CPU, x64 lets the solver cores promote their small dense systems to
    # f64 (conditioning).  On TPU, x64 must stay OFF: TPU XLA implements
    # LU/eigh only for f32, and any stray f64 op aborts the remote compiler.
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from vplines_slam_tpu.estimator.vio import VioEngine
    from vplines_slam_tpu.estimator.window import WindowConfig
    from vplines_slam_tpu.models import imu as imu_mod
    from vplines_slam_tpu.utils import evaluation as ev
    from vplines_slam_tpu.utils import geometry as geo
    from vplines_slam_tpu.utils import synthetic as syn

    dtype = jnp.float32 if args.f32 else jnp.float64
    R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], dtype)
    q_ic = geo.rot_to_quat(R_BC)
    p_ic = jnp.asarray([0.05, 0.02, 0.03], dtype)
    cfg = WindowConfig(max_points=96, max_lines=8, max_imu=32)
    eng = VioEngine(cfg, imu_mod.default_params(dtype), q_ic=q_ic, p_ic=p_ic, dtype=dtype)

    traj = syn.figure8_trajectory()
    X = syn.scatter_landmarks(400, seed=0)
    frame_times = np.arange(0.0, args.duration, 0.1)
    imu_times = np.arange(0.0, args.duration + 1e-9, 1.0 / 200)
    accs, gyrs = syn.imu_samples(
        traj, jnp.asarray(imu_times),
        acc_noise=0.02 if args.noise else 0.0,
        gyr_noise=0.002 if args.noise else 0.0,
    )
    accs, gyrs = np.asarray(accs), np.asarray(gyrs)

    est_t, est_p, est_q = [], [], []
    imu_idx = 0
    t_start = time.time()
    for ft in frame_times:
        while imu_idx < len(imu_times) and imu_times[imu_idx] <= ft + 1e-9:
            eng.add_imu(imu_times[imu_idx], accs[imu_idx], gyrs[imu_idx])
            imu_idx += 1
        q_wb, p_wb = traj.quat(ft), traj.pos(ft)
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, q_ic, p_ic))
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x.astype(dtype)))(X.astype(dtype))
        uv = np.asarray(Xc[:, :2] / Xc[:, 2:3])
        vis = np.asarray((Xc[:, 2] > 0.3) & (np.abs(uv[:, 0]) < 0.82) & (np.abs(uv[:, 1]) < 0.55))
        sel = np.flatnonzero(vis)[: cfg.max_points - 8]
        ids = np.full(cfg.max_points, -1, np.int32)
        rays = np.zeros((cfg.max_points, 3))
        rays[:, 2] = 1.0
        ids[: len(sel)] = sel
        rays[: len(sel), :2] = uv[sel]
        out = eng.add_frame(ft, ids, rays)
        if out is not None and eng.initialized:
            est_t.append(ft)
            est_p.append(np.asarray(out.p))
            est_q.append(np.asarray(out.q))
            print(
                f"t={ft:5.2f}  p=({out.p[0]:+.3f},{out.p[1]:+.3f},{out.p[2]:+.3f})"
                f"  kf={bool(out.is_keyframe)}  cost={float(out.ba_cost):.3e}"
            )
    wall = time.time() - t_start

    gt_p = np.stack([np.asarray(traj.pos(t)) for t in est_t])
    ate = ev.ate_rmse(np.stack(est_p), gt_p)
    print(f"\nframes: {len(est_t)}  wall: {wall:.1f}s  "
          f"fps: {len(frame_times)/wall:.2f}  ATE RMSE: {ate*100:.2f} cm")
    if args.out:
        ev.save_tum(args.out, est_t, est_p, est_q)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
