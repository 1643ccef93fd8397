"""Trajectory IO (TUM format) and ATE evaluation.

The reference dumps TUM trajectories (`output_path`, euroc_config.yaml:6) and
relies on external evo-style tooling + the benchmark_publisher GT overlay
(`benchmark_publisher_node.cpp:33-52`); here the ATE harness is built in:
SE(3)/Sim(3) Umeyama alignment + RMSE, usable in tests and benchmarks.
"""

from __future__ import annotations

import numpy as np


def save_tum(path, times, ps, qs):
    """Write TUM format: t x y z qx qy qz qw (quaternions stored wxyz here)."""
    with open(path, "w") as f:
        for t, p, q in zip(times, ps, qs):
            f.write(
                f"{t:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )


def load_tum(path):
    data = np.loadtxt(path)
    times = data[:, 0]
    ps = data[:, 1:4]
    qs = data[:, [7, 4, 5, 6]]  # -> wxyz
    return times, ps, qs


def umeyama_alignment(x, y, with_scale=False):
    """Least-squares similarity/rigid transform aligning x to y: y ≈ c R x + t.

    x, y: [N, 3].  Returns (R, t, c).
    """
    mu_x = x.mean(axis=0)
    mu_y = y.mean(axis=0)
    xc = x - mu_x
    yc = y - mu_y
    cov = yc.T @ xc / x.shape[0]
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc**2).sum() / x.shape[0]
        c = np.trace(np.diag(d) @ S) / var_x
    else:
        c = 1.0
    t = mu_y - c * R @ mu_x
    return R, t, c


def ate_rmse(est_p, gt_p, align=True, with_scale=False):
    """Absolute trajectory error RMSE after (optional) Umeyama alignment."""
    est_p = np.asarray(est_p, float)
    gt_p = np.asarray(gt_p, float)
    if align:
        R, t, c = umeyama_alignment(est_p, gt_p, with_scale)
        est_p = (c * (R @ est_p.T)).T + t
    err = est_p - gt_p
    return float(np.sqrt((err**2).sum(axis=1).mean()))


def associate(times_a, times_b, max_dt=0.02):
    """Greedy nearest-timestamp association; returns index pairs."""
    ia, ib = [], []
    j = 0
    for i, t in enumerate(times_a):
        while j + 1 < len(times_b) and abs(times_b[j + 1] - t) < abs(times_b[j] - t):
            j += 1
        if abs(times_b[j] - t) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.asarray(ia), np.asarray(ib)
