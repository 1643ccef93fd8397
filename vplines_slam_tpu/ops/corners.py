"""Scored Shi-Tomasi corner detection with spacing-aware selection.

Replaces the reference's modified ``goodFeaturesToTrack`` that returns
per-corner min-eigenvalue scores (``feature_tracker/src/cvmodified/``,
called at feature_tracker.cpp:384) and its sequential mask-based min-distance
suppression (``FeatureTracker::setMask:37-82``).

TPU design: the min-eig response image is pure convs (MXU); non-max
suppression is a max-pool comparison; min-distance spacing is enforced by a
grid-cell argmax (one winner per min_dist cell) instead of the reference's
sequential greedy mask — parallel, deterministic, and equivalent in feature
density.  Existing tracked features suppress their cells via a priority
channel (the reference sorts by track length; we give tracked features
+inf priority in their cells).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import _conv2d_same, box_filter, sobel_gradients


def min_eig_response(img, block_size=3):
    """Per-pixel min eigenvalue of the structure tensor (cv::cornerMinEigenVal)."""
    gx, gy = sobel_gradients(img)
    k = jnp.ones((block_size, block_size), img.dtype)
    a = _conv2d_same(gx * gx, k)
    b = _conv2d_same(gx * gy, k)
    c = _conv2d_same(gy * gy, k)
    return ((a + c) - jnp.sqrt((a - c) ** 2 + 4.0 * b * b)) * 0.5


def _nms(resp, radius=1):
    k = 2 * radius + 1
    mx = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return jnp.where(resp >= mx, resp, 0.0)


def detect(
    img,
    max_corners,
    min_dist=30,
    quality=0.01,
    existing_xy=None,
    existing_mask=None,
    border=5,
    region_mask=None,
):
    """Top-`max_corners` corners with ≥min_dist spacing, avoiding existing ones.

    region_mask: optional [H, W] 0/1 detection region (the reference's
    fisheye mask, feature_tracker.cpp setMask:40 starts from it).
    Returns (xy [max_corners, 2], score [max_corners], valid [max_corners]).
    Fixed output shape — unused slots have valid=False.
    """
    H, W = img.shape
    resp = min_eig_response(img)
    resp = _nms(resp)
    thresh = quality * jnp.max(resp)
    resp = jnp.where(resp > thresh, resp, 0.0)
    # kill borders
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    resp = jnp.where(inb, resp, 0.0)
    if region_mask is not None:
        resp = jnp.where(region_mask > 0, resp, 0.0)

    # grid-cell selection: one winner per min_dist x min_dist cell
    ch = -(-H // min_dist)
    cw = -(-W // min_dist)
    padH, padW = ch * min_dist, cw * min_dist
    rp = jnp.zeros((padH, padW), img.dtype).at[:H, :W].set(resp)

    # suppress cells already owned by tracked features
    if existing_xy is not None:
        ex = jnp.clip((existing_xy[:, 0] / min_dist).astype(jnp.int32), 0, cw - 1)
        ey = jnp.clip((existing_xy[:, 1] / min_dist).astype(jnp.int32), 0, ch - 1)
        m = (
            existing_mask
            if existing_mask is not None
            else jnp.ones(existing_xy.shape[0], bool)
        )
        occupied = jnp.zeros((ch, cw), bool).at[ey, ex].set(
            jnp.ones_like(m) & m, mode="drop"
        )
    else:
        occupied = jnp.zeros((ch, cw), bool)

    cells = rp.reshape(ch, min_dist, cw, min_dist).transpose(0, 2, 1, 3).reshape(
        ch, cw, min_dist * min_dist
    )
    best_in_cell = jnp.argmax(cells, axis=-1)
    best_val = jnp.take_along_axis(cells, best_in_cell[..., None], axis=-1)[..., 0]
    best_val = jnp.where(occupied, 0.0, best_val)
    by = best_in_cell // min_dist
    bx = best_in_cell % min_dist
    cy = jnp.arange(ch)[:, None] * min_dist + by
    cx = jnp.arange(cw)[None, :] * min_dist + bx

    flat_val = best_val.reshape(-1)
    flat_x = cx.reshape(-1).astype(img.dtype)
    flat_y = cy.reshape(-1).astype(img.dtype)
    k = min(max_corners, flat_val.shape[0])
    top_val, top_idx = jax.lax.top_k(flat_val, k)
    xy = jnp.stack([flat_x[top_idx], flat_y[top_idx]], axis=-1)
    valid = top_val > 0.0
    if k < max_corners:
        pad = max_corners - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), img.dtype)])
        top_val = jnp.concatenate([top_val, jnp.zeros(pad, img.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return xy, top_val, valid
