#!/usr/bin/env python
"""Run the full SLAM system on a EuRoC ASL sequence directory.

Usage:
  python examples/run_euroc.py /path/to/MH_01_easy [--config configs/euroc.yaml]
         [--out traj.tum] [--lines] [--loop] [--f32] [--max-frames N]

Writes a TUM trajectory and, when ground truth is present, prints ATE RMSE —
the equivalent of replaying the reference's euroc.launch + benchmark_publisher
+ external evo evaluation, in one process.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "euroc.yaml"))
    ap.add_argument("--out", default="euroc_traj.tum")
    ap.add_argument("--lines", action="store_true")
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.f32 else jnp.float64

    from vplines_slam_tpu import native
    from vplines_slam_tpu.pipeline.system import SlamSystem
    from vplines_slam_tpu.utils import evaluation as ev
    from vplines_slam_tpu.utils.config import load_profile
    from vplines_slam_tpu.utils.dataset import EurocDataset

    prof = load_profile(args.config, dtype)
    system = SlamSystem(
        prof.camera,
        window_cfg=prof.window,
        tracker_cfg=prof.tracker,
        line_cfg=prof.lines if args.lines else None,
        imu_params=prof.imu_params,
        q_ic=prof.q_ic,
        p_ic=prof.p_ic,
        use_loop_closure=args.loop,
        mesh=prof.make_mesh(),  # mapping_multichip profile: distributed BA
        dtype=dtype,
    )

    ds = EurocDataset(args.dataset)
    frames = ds.frames()
    imu = ds.imu()
    if args.max_frames:
        frames = frames[: args.max_frames]

    est_t, est_p, est_q = [], [], []
    ii = 0
    t0 = time.time()
    for k, fr in enumerate(frames):
        while ii < len(imu) and imu[ii].t <= fr.t + 1e-9:
            system.add_imu(imu[ii].t, imu[ii].acc, imu[ii].gyr)
            ii += 1
        out = system.add_image(fr.t, jnp.asarray(fr.image(), dtype))
        if out is not None:
            est_t.append(out.t)
            est_p.append(out.p_corrected)
            est_q.append(out.q_corrected)
            if k % 50 == 0:
                print(f"[{k}/{len(frames)}] t={out.t:.2f} p={out.p_corrected.round(3)}"
                      f" kf={out.is_keyframe} loop={out.loop_closed}")
    wall = time.time() - t0
    print(f"\nprocessed {len(frames)} frames in {wall:.1f}s ({len(frames)/wall:.1f} fps)")

    if est_t:
        native.write_tum(args.out, np.asarray(est_t), np.stack(est_p), np.stack(est_q))
        print("wrote", args.out)
        try:
            gt_t, gt_p, gt_q = ds.ground_truth()
            ia, ib = ev.associate(np.asarray(est_t), gt_t)
            ate = ev.ate_rmse(np.stack(est_p)[ia], gt_p[ib])
            print(f"ATE RMSE vs ground truth: {ate*100:.2f} cm over {len(ia)} poses")
        except (FileNotFoundError, OSError):
            print("(no ground truth found for ATE)")


if __name__ == "__main__":
    main()
