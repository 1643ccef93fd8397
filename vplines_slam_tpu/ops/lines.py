"""Line segment detection: batched anchor-growth formulation of EDLines.

Replaces the reference's Edge-Drawing + least-squares EDLine detector
(``line_matching/src/edline_detector.{h,cpp}``, EDLineParam
{ksize=5, sigma=1, gradThresh=30, anchorThresh=5, scanIntervals=2,
minLineLen, fitErrThresh}) whose sequential edge walking cannot map to a
vector machine.  TPU formulation:

1. Scharr gradients -> magnitude + level-line direction (one conv pass).
2. Anchor extraction: directional local maxima above threshold (one
   vectorized compare; EdgeDrawing anchor semantics).
3. Segment support: every selected anchor probes a straight ray along its
   level-line direction in BOTH directions — ALL ray samples for ALL anchors
   are gathered in one batched nearest-pixel fetch, and EDLine's sequential
   walk gate (gradient above threshold, direction aligned) becomes a prefix-
   AND (cumulative product) along the ray.  No sequential scan: a 96-step
   walk costs one [anchors x steps] gather instead of 96 dependent ones
   (~10x faster on TPU, where the scan was latency-bound).
4. Subpixel refinement: the edge's perpendicular offset at every ray sample
   comes from a 3-tap parabolic fit of the gradient magnitude across the
   ray ("tube" sampling at +/-1 normal); the least-squares line fit (PCA of
   the offset-corrected support pixels) provides both the fit-error gate and
   endpoints by projection of the support extremes.
5. Deduplication by (θ, ρ) binning — one winner per line bin (parallel
   replacement of walk-ownership).

Output is fixed-shape: [max_lines, 4] endpoint pixels + validity + length.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample, gaussian_blur, scharr_gradients


_debug_stash = {}


class LineDetectConfig(NamedTuple):
    grad_thresh: float = 0.03  # gradient magnitude gate ([0,1] images)
    anchor_thresh: float = 0.004  # directional-peak margin (anchorThreshold)
    max_anchors: int = 512  # anchors grown in parallel
    max_steps: int = 96  # growth steps each way (pixels)
    angle_tol: float = 0.2  # rad, alignment gate during growth
    min_len: float = 30.0  # minLineLen
    fit_err: float = 1.5  # max RMS point-line distance (lineFitErrThreshold)
    max_lines: int = 64  # output capacity
    theta_bins: int = 36
    rho_bin: float = 12.0  # pixels


def _level_line_dir(gx, gy):
    """Unit direction along the edge (perpendicular to the gradient)."""
    mag = jnp.sqrt(gx * gx + gy * gy)
    m = jnp.maximum(mag, 1e-12)
    return -gy / m, gx / m, mag


def detect_lines(img, cfg: LineDetectConfig = LineDetectConfig()):
    """Detect line segments.  img: [H, W] float in [0,1].

    Returns (segments [max_lines, 4] = (x1,y1,x2,y2), lengths, valid).
    """
    H, W = img.shape
    dtype = img.dtype
    img_s = gaussian_blur(img, 5, 1.0)  # EDLineParam ksize=5, sigma=1
    gx, gy = scharr_gradients(img_s)
    dx, dy, mag = _level_line_dir(gx, gy)

    # ---- anchors: local maxima of |grad| across the edge direction --------
    # EDLine's anchor test (EdgeDrawing): compare against the two neighbors
    # across the quantized gradient direction — left/right for vertical
    # edges (|gx|>=|gy|), up/down for horizontal ones.  Shifted slices only;
    # a fractional-offset bilinear probe here costs ~3M gathers per frame.
    magp = jnp.pad(mag, 1)
    mag_l = jax.lax.dynamic_slice(magp, (1, 0), (H, W))
    mag_r = jax.lax.dynamic_slice(magp, (1, 2), (H, W))
    mag_u = jax.lax.dynamic_slice(magp, (0, 1), (H, W))
    mag_d = jax.lax.dynamic_slice(magp, (2, 1), (H, W))
    grad_along_x = jnp.abs(gx) >= jnp.abs(gy)  # vertical edge
    is_anchor = (mag > cfg.grad_thresh) & jnp.where(
        grad_along_x,
        (mag >= mag_l + cfg.anchor_thresh) & (mag >= mag_r + cfg.anchor_thresh),
        (mag >= mag_u + cfg.anchor_thresh) & (mag >= mag_d + cfg.anchor_thresh),
    )
    # spatially-stratified anchor selection: best anchor per grid cell, then
    # top-k over cells.  Pure top-k by magnitude degenerates on real images
    # (speckle/corner pixels out-gradient line edges everywhere); EDLine
    # avoids this by scanning ALL anchors — stratification is the batched
    # equivalent with bounded compute.
    score_im = jnp.where(is_anchor, mag, 0.0)
    cell = 16
    ch, cw = -(-H // cell), -(-W // cell)
    pad = jnp.zeros((ch * cell, cw * cell), dtype).at[:H, :W].set(score_im)
    cells = pad.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(
        ch, cw, cell * cell
    )
    best_in = jnp.argmax(cells, axis=-1)
    best_val = jnp.take_along_axis(cells, best_in[..., None], axis=-1)[..., 0]
    by = jnp.arange(ch)[:, None] * cell + best_in // cell
    bx = jnp.arange(cw)[None, :] * cell + best_in % cell
    flat_val = best_val.reshape(-1)
    k_cells = min(cfg.max_anchors, flat_val.shape[0])
    top_score, top_cell = jax.lax.top_k(flat_val, k_cells)
    ax = bx.reshape(-1)[top_cell].astype(dtype)
    ay = by.reshape(-1)[top_cell].astype(dtype)
    a_ok = top_score > 0.0
    if k_cells < cfg.max_anchors:
        padn = cfg.max_anchors - k_cells
        ax = jnp.concatenate([ax, jnp.zeros(padn, dtype)])
        ay = jnp.concatenate([ay, jnp.zeros(padn, dtype)])
        a_ok = jnp.concatenate([a_ok, jnp.zeros(padn, bool)])

    # ---- straight-ray tube probe (parallel EDLine walk) -------------------
    # Anchor directions at integer anchor pixels (stratified argmax yields
    # integer coords, so plain indexing beats interpolation).
    axi = ax.astype(jnp.int32)
    ayi = ay.astype(jnp.int32)
    d0x = dx[ayi, axi]  # [A] level-line (along-edge) unit direction
    d0y = dy[ayi, axi]
    n0x = -d0y  # unit normal (across the edge)
    n0y = d0x
    A = cfg.max_anchors
    S = cfg.max_steps

    # sample positions: anchor ± t*d0 for t = 1..S, both signs in one batch
    t = jnp.arange(1, S + 1, dtype=dtype)  # [S]
    sgn = jnp.asarray([1.0, -1.0], dtype)  # [2]
    px = ax[:, None, None] + sgn[None, :, None] * t[None, None, :] * d0x[:, None, None]
    py = ay[:, None, None] + sgn[None, :, None] * t[None, None, :] * d0y[:, None, None]
    # [A, 2, S] nearest-pixel indices (EDLine walks integer pixels)
    xi = jnp.round(px).astype(jnp.int32)
    yi = jnp.round(py).astype(jnp.int32)
    inb = (xi >= 1) & (xi < W - 2) & (yi >= 1) & (yi < H - 2)
    xi_c = jnp.clip(xi, 0, W - 1)
    yi_c = jnp.clip(yi, 0, H - 1)
    # one fused gather for (mag, dx, dy) at every ray sample
    fields = jnp.stack([mag, dx, dy], axis=-1).reshape(H * W, 3)
    flat_idx = (yi_c * W + xi_c).reshape(-1)
    smp = jnp.take(fields, flat_idx, axis=0).reshape(A, 2, S, 3)
    m_s, dx_s, dy_s = smp[..., 0], smp[..., 1], smp[..., 2]
    # alignment with the anchor direction (|.| folds hemisphere flips)
    align = jnp.abs(dx_s * d0x[:, None, None] + dy_s * d0y[:, None, None])
    ok = inb & (m_s > cfg.grad_thresh) & (align > jnp.cos(cfg.angle_tol))
    # EDLine's walk stops at the first gate failure: prefix-AND along the ray
    alive = jnp.cumsum((~ok).astype(jnp.int32), axis=-1) == 0  # [A, 2, S]
    av = alive.astype(dtype)

    # subpixel perpendicular offset: parabolic peak of |grad| across the ray
    nxi = jnp.round(px + n0x[:, None, None]).astype(jnp.int32)
    nyi = jnp.round(py + n0y[:, None, None]).astype(jnp.int32)
    mxi = jnp.round(px - n0x[:, None, None]).astype(jnp.int32)
    myi = jnp.round(py - n0y[:, None, None]).astype(jnp.int32)
    mag_flat = mag.reshape(-1)
    m_p = jnp.take(
        mag_flat,
        (jnp.clip(nyi, 0, H - 1) * W + jnp.clip(nxi, 0, W - 1)).reshape(-1),
    ).reshape(A, 2, S)
    m_m = jnp.take(
        mag_flat,
        (jnp.clip(myi, 0, H - 1) * W + jnp.clip(mxi, 0, W - 1)).reshape(-1),
    ).reshape(A, 2, S)
    denom = m_p - 2.0 * m_s + m_m
    delta = jnp.clip(
        0.5 * (m_m - m_p) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9),
        -1.0, 1.0,
    )
    qx = px + delta * n0x[:, None, None]  # offset-corrected support pixels
    qy = py + delta * n0y[:, None, None]

    # ---- moments + PCA line fit (anchor contributes weight 1, offset 0) ---
    n = 1.0 + jnp.sum(av, axis=(1, 2))  # [A]
    sx = ax + jnp.sum(qx * av, axis=(1, 2))
    sy = ay + jnp.sum(qy * av, axis=(1, 2))
    sxx = ax * ax + jnp.sum(qx * qx * av, axis=(1, 2))
    sxy = ax * ay + jnp.sum(qx * qy * av, axis=(1, 2))
    syy = ay * ay + jnp.sum(qy * qy * av, axis=(1, 2))
    mx = sx / n
    my = sy / n
    cxx = sxx / n - mx * mx
    cxy = sxy / n - mx * my
    cyy = syy / n - my * my
    theta_f = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)  # major axis angle
    ux = jnp.cos(theta_f)
    uy = jnp.sin(theta_f)
    # rms orthogonal fit error = sqrt(minor eigenvalue)
    tr = cxx + cyy
    det = cxx * cyy - cxy * cxy
    lam_min = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    fits = jnp.sqrt(jnp.maximum(lam_min, 0.0))
    # endpoints: support extremes projected on the fitted line
    tq = (qx - mx[:, None, None]) * ux[:, None, None] + (
        qy - my[:, None, None]
    ) * uy[:, None, None]
    t_hi = jnp.max(jnp.where(alive, tq, 0.0), axis=(1, 2))
    t_lo = jnp.min(jnp.where(alive, tq, 0.0), axis=(1, 2))
    segs = jnp.stack(
        [mx + t_lo * ux, my + t_lo * uy, mx + t_hi * ux, my + t_hi * uy],
        axis=-1,
    )
    lens = t_hi - t_lo
    supports = n
    good = (
        a_ok
        & (lens >= cfg.min_len)
        & (fits <= cfg.fit_err)
        & (supports >= cfg.min_len * 0.6)
    )
    if _debug_stash.get("enabled"):
        _debug_stash["pre"] = dict(
            segs=segs, lens=lens, fits=fits, supports=supports, good=good,
            a_ok=a_ok, ax=ax, ay=ay,
        )

    # ---- dedupe by (θ, ρ) bin: keep the longest per bin -------------------
    dxs = segs[:, 2] - segs[:, 0]
    dys = segs[:, 3] - segs[:, 1]
    theta = jnp.arctan2(dys, dxs) % jnp.pi  # undirected
    nx_ = -jnp.sin(theta)
    ny_ = jnp.cos(theta)
    rho = nx_ * segs[:, 0] + ny_ * segs[:, 1]
    tb = jnp.clip(
        (theta / jnp.pi * cfg.theta_bins).astype(jnp.int32), 0, cfg.theta_bins - 1
    )
    import math

    max_rho = math.sqrt(H * H + W * W)  # host constant (H, W are static)
    n_rho = int(2 * max_rho / cfg.rho_bin) + 2
    rb = jnp.clip(
        ((rho + max_rho) / cfg.rho_bin).astype(jnp.int32), 0, n_rho - 1
    )
    bin_id = tb * n_rho + rb
    # winner per bin: the segment with max length
    order = jnp.argsort(-jnp.where(good, lens, -1.0))
    sorted_bins = bin_id[order]
    # first occurrence of each bin in length-sorted order wins
    seen_before = jnp.zeros_like(sorted_bins, bool)
    # vectorized "first occurrence": compare against all previous entries
    eq = sorted_bins[:, None] == sorted_bins[None, :]
    prev = jnp.tril(jnp.ones_like(eq), k=-1)
    seen_before = jnp.any(eq & prev, axis=1)
    win_sorted = good[order] & ~seen_before
    # rank the per-bin winners by length and take the top max_lines of them
    win_len = jnp.where(win_sorted, lens[order], -1.0)
    k = min(cfg.max_lines, cfg.max_anchors)
    top_vals, top_pos = jax.lax.top_k(win_len, k)
    sel = order[top_pos]
    win = top_vals > 0.0

    # merge collinear support: extend each winner to the union extent of all
    # good segments in its bin (walks can die mid-line; EDLine's walk covers
    # the full support, this recovers the same full-length segments)
    def merge(si, w):
        bid = bin_id[si]
        same = good & (bin_id == bid)
        th = theta[si]
        ux, uy = jnp.cos(th), jnp.sin(th)
        mx = 0.5 * (segs[si, 0] + segs[si, 2])
        my = 0.5 * (segs[si, 1] + segs[si, 3])
        t1 = (segs[:, 0] - mx) * ux + (segs[:, 1] - my) * uy
        t2 = (segs[:, 2] - mx) * ux + (segs[:, 3] - my) * uy
        t_lo = jnp.min(jnp.where(same, jnp.minimum(t1, t2), jnp.inf))
        t_hi = jnp.max(jnp.where(same, jnp.maximum(t1, t2), -jnp.inf))
        seg = jnp.stack(
            [mx + t_lo * ux, my + t_lo * uy, mx + t_hi * ux, my + t_hi * uy]
        )
        return jnp.where(w, seg, segs[si]), jnp.where(w, t_hi - t_lo, 0.0)

    merged_segs, merged_lens = jax.vmap(merge)(sel, win)
    out_segs = jnp.where(win[:, None], merged_segs, 0.0)
    out_lens = jnp.where(win, merged_lens, 0.0)
    if k < cfg.max_lines:
        pad = cfg.max_lines - k
        out_segs = jnp.concatenate([out_segs, jnp.zeros((pad, 4), dtype)])
        out_lens = jnp.concatenate([out_lens, jnp.zeros(pad, dtype)])
        win = jnp.concatenate([win, jnp.zeros(pad, bool)])
    return out_segs, out_lens, win


def seg_angle(segs):
    """Undirected segment angle in [0, π) (line_feature_tracker.cpp segAngle:20)."""
    return jnp.arctan2(segs[..., 3] - segs[..., 1], segs[..., 2] - segs[..., 0]) % jnp.pi


def classify_hv(segs, valid, band=jnp.pi / 4):
    """Split into horizontal-ish / vertical-ish (π/4 bands,
    line_feature_tracker.cpp:128-226)."""
    a = seg_angle(segs)
    horiz = ((a < band) | (a > jnp.pi - band)) & valid
    vert = (jnp.abs(a - jnp.pi / 2) <= band) & valid
    return horiz, vert
