"""Debug visualization: feature/line overlays and trajectory plots.

Offline replacements for the reference's rviz publishers and image_show node
(visualization.cpp registerPub:41-62, image_show_node.cpp): render overlays
to numpy RGB images / matplotlib figures instead of ROS markers.
"""

from __future__ import annotations

import numpy as np


def to_rgb(img):
    g = np.clip(np.asarray(img, float), 0.0, 1.0)
    return np.stack([g, g, g], axis=-1)


def draw_points(rgb, xy, valid=None, color=(0.0, 1.0, 0.0), radius=2, track_cnt=None):
    """Overlay tracked points; longer tracks get redder (feature_tracker's
    track-length coloring)."""
    rgb = rgb.copy()
    H, W, _ = rgb.shape
    xy = np.asarray(xy)
    n = len(xy)
    valid = np.ones(n, bool) if valid is None else np.asarray(valid)
    for k in range(n):
        if not valid[k]:
            continue
        x, y = int(round(xy[k, 0])), int(round(xy[k, 1]))
        if not (0 <= x < W and 0 <= y < H):
            continue
        c = color
        if track_cnt is not None:
            t = min(float(track_cnt[k]) / 20.0, 1.0)
            c = (t, 1.0 - t, 0.0)
        rgb[max(0, y - radius) : y + radius + 1, max(0, x - radius) : x + radius + 1] = c
    return rgb


def draw_lines(rgb, segs, valid=None, color=(0.2, 0.6, 1.0), vp_id=None):
    """Overlay line segments, optionally colored by VP cluster (the
    reference's per-VP line coloring in rviz)."""
    rgb = rgb.copy()
    H, W, _ = rgb.shape
    segs = np.asarray(segs)
    n = len(segs)
    valid = np.ones(n, bool) if valid is None else np.asarray(valid)
    palette = [(1.0, 0.3, 0.3), (0.3, 1.0, 0.3), (0.3, 0.5, 1.0), (0.8, 0.8, 0.2)]
    for k in range(n):
        if not valid[k]:
            continue
        c = palette[int(vp_id[k]) % 4] if vp_id is not None else color
        x1, y1, x2, y2 = segs[k]
        length = int(max(abs(x2 - x1), abs(y2 - y1), 1))
        for t in np.linspace(0.0, 1.0, 2 * length + 1):
            x = int(round(x1 + t * (x2 - x1)))
            y = int(round(y1 + t * (y2 - y1)))
            if 0 <= x < W and 0 <= y < H:
                rgb[y, x] = c
    return rgb


def save_png(path, rgb):
    from PIL import Image

    Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(path)


def plot_trajectories(path, trajs, labels=None, title="trajectory"):
    """Top-down XY plot of one or more trajectories -> png."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    for i, p in enumerate(trajs):
        p = np.asarray(p)
        lbl = labels[i] if labels else f"traj {i}"
        ax.plot(p[:, 0], p[:, 1], label=lbl, lw=1.2)
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
