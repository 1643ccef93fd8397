"""Chessboard detection -> full intrinsic calibration on rendered boards
(camera_model/src/chessboard + intrinsic_calib.cc parity, VERDICT item 10):
recover synthetic intrinsics within tolerance from images alone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import intrinsic_calib as cal
from vplines_slam_tpu.ops import chessboard as cb
from vplines_slam_tpu.ops.image import gaussian_blur

H, W = 240, 320
FX, FY, CX, CY = 280.0, 278.0, 160.0, 120.0
ROWS, COLS = 5, 7  # inner corners
SQ = 0.05


def render_board(R, t):
    """Checkerboard of (ROWS+1)x(COLS+1) squares on the z=0 board plane."""
    K_inv = np.linalg.inv(
        np.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
    )
    uu, vv = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    rays = np.stack([uu, vv, np.ones_like(uu)], -1) @ K_inv.T  # [H, W, 3]
    Rt = np.asarray(R).T
    d_b = rays @ Rt.T  # ray directions in board frame
    o_b = -Rt @ np.asarray(t)  # camera center in board frame
    s = -o_b[2] / np.where(np.abs(d_b[..., 2]) < 1e-9, 1e-9, d_b[..., 2])
    xb = o_b[0] + s * d_b[..., 0]
    yb = o_b[1] + s * d_b[..., 1]
    front = s > 0
    # board spans squares [-1, COLS] x [-1, ROWS] in units of SQ so inner
    # corners land at (i*SQ, j*SQ), i in 0..COLS-1? offset so corner (0,0)
    # of the INNER grid is at board origin
    inside = (
        (xb > -SQ) & (xb < COLS * SQ) & (yb > -SQ) & (yb < ROWS * SQ) & front
    )
    checker = (np.floor(xb / SQ) + np.floor(yb / SQ)) % 2
    img = np.where(inside, 0.15 + 0.7 * checker, 0.55)
    img = np.asarray(gaussian_blur(jnp.asarray(img, jnp.float64), 5, 0.8))
    return img


def look_at_pose(yaw, pitch, dist):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    R = Ry @ Rx
    center = np.asarray([(COLS - 1) * SQ / 2, (ROWS - 1) * SQ / 2, 0.0])
    t = -R @ center + np.asarray([0.0, 0.0, dist])
    return R, t


@pytest.mark.slow
def test_detect_and_calibrate_from_rendered_boards():
    views = [
        look_at_pose(0.00, 0.00, 0.55),
        look_at_pose(0.25, 0.10, 0.60),
        look_at_pose(-0.22, 0.18, 0.50),
        look_at_pose(0.15, -0.25, 0.65),
        look_at_pose(-0.10, -0.12, 0.45),
    ]
    N = ROWS * COLS
    obj = np.stack(
        [
            np.asarray([[j * SQ, i * SQ] for i in range(ROWS) for j in range(COLS)])
        ]
        * len(views)
    )
    imgs_xy = []
    found_all = True
    for R, t in views:
        img = render_board(R, t)
        corners, found = cb.detect_chessboard(img, ROWS, COLS)
        found_all &= found
        if found:
            imgs_xy.append(corners)
    assert found_all, "board not found in all views"
    img_xy = jnp.asarray(np.stack(imgs_xy))
    mask = jnp.ones((len(views), N), bool)
    params, rms = cal.calibrate(jnp.asarray(obj), img_xy, mask)
    assert float(rms) < 0.6, f"rms {float(rms):.3f}px"
    assert abs(float(params["fx"]) - FX) < 0.02 * FX, params
    assert abs(float(params["fy"]) - FY) < 0.02 * FY, params
    assert abs(float(params["cx"]) - CX) < 8.0, params
    assert abs(float(params["cy"]) - CY) < 8.0, params


def test_detector_finds_grid_single_view():
    R, t = look_at_pose(0.1, 0.05, 0.55)
    img = render_board(R, t)
    corners, found = cb.detect_chessboard(img, ROWS, COLS)
    assert found
    # detected corners lie near true projections (set match within 1.5 px)
    K = np.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
    true_b = np.asarray(
        [[j * SQ, i * SQ, 0.0] for i in range(ROWS) for j in range(COLS)]
    )
    Xc = true_b @ np.asarray(R).T + np.asarray(t)
    uv = (Xc / Xc[:, 2:3]) @ K.T
    d = np.linalg.norm(corners[:, None, :] - uv[None, :, 0:2], axis=-1)
    nearest = d.min(axis=1)
    assert np.median(nearest) < 1.0, np.median(nearest)
    assert nearest.max() < 2.5, nearest.max()
