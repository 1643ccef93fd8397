#!/usr/bin/env python
"""Intrinsic calibration CLI (camera_model intrinsic_calib.cc:247 parity).

  python examples/calibrate.py --images DIR --rows 6 --cols 8 --square 0.03

Detects the (rows x cols) inner-corner chessboard grid in every image
(ops/chessboard: device ChESS response + host lattice ordering), then runs
Zhang init + joint LM refinement (models/intrinsic_calib) and prints the
pinhole + rad-tan parameters as a camera yaml block.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def load_gray(path):
    from vplines_slam_tpu.utils.dataset import load_image

    return load_image(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="folder of board images")
    ap.add_argument("--rows", type=int, default=6, help="inner corners per column")
    ap.add_argument("--cols", type=int, default=8, help="inner corners per row")
    ap.add_argument("--square", type=float, default=0.03, help="square size (m)")
    args = ap.parse_args()

    from vplines_slam_tpu.models import intrinsic_calib as cal
    from vplines_slam_tpu.ops import chessboard as cb

    paths = sorted(
        sum((glob.glob(os.path.join(args.images, e)) for e in
             ("*.png", "*.jpg", "*.pgm", "*.bmp")), [])
    )
    if not paths:
        print(f"no images in {args.images}", file=sys.stderr)
        return 1

    N = args.rows * args.cols
    obj1 = np.asarray(
        [[j * args.square, i * args.square]
         for i in range(args.rows) for j in range(args.cols)]
    )
    obj, img_xy = [], []
    for p in paths:
        img = load_gray(p)
        corners, found = cb.detect_chessboard(img, args.rows, args.cols)
        print(f"{os.path.basename(p)}: {'ok' if found else 'NO BOARD'}")
        if found:
            obj.append(obj1)
            img_xy.append(corners)
    if len(obj) < 3:
        print("need >= 3 usable views", file=sys.stderr)
        return 1

    V = len(obj)
    params, rms = cal.calibrate(
        jnp.asarray(np.stack(obj)), jnp.asarray(np.stack(img_xy)),
        jnp.ones((V, N), bool),
    )
    print(f"\n# {V} views, reprojection RMS {float(rms):.3f} px")
    print("camera:")
    print("  model: pinhole")
    for k in ("fx", "fy", "cx", "cy"):
        print(f"  {k}: {float(params[k]):.4f}")
    print(
        "  distortion: ["
        + ", ".join(f"{float(params[k]):.6e}" for k in ("k1", "k2", "p1", "p2"))
        + "]"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
