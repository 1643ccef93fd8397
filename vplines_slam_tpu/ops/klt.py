"""Batched pyramidal Lucas-Kanade tracking (2D points and 1D along-normal).

TPU-native replacement for (a) ``cv::calcOpticalFlowPyrLK`` in the point
front-end (feature_tracker.cpp:139, 21x21, 3 levels) and (b) the reference's
custom SIMD KLT (``line_matching/src/klt.{h,cpp}`` + lk_tracker_invoker_*):
1D along-direction mode (lk_tracker_invoker_1d.cpp:150-424), per-patch
gain/bias illumination adaptation (getImageNormParams, applied at :359-382).

Instead of SSE over pixels, every feature is a lane: patches for all N
features are gathered at once, iterations are fixed-count with masked
convergence, and all reductions are batched (VPU/MXU shapes).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample, build_pyramid, scharr_gradients


class KLTConfig(NamedTuple):
    win: int = 21  # patch side (reference 21x21)
    levels: int = 3  # pyramid levels (reference 3)
    iters: int = 10  # fixed iterations per level (reference: 30 max w/ eps)
    # spatial-gradient conditioning threshold.  OpenCV's minEigThreshold
    # default (1e-4) applies to 0..255-scale intensities; on [0,1] images the
    # same physical gate scales by 1/255^2 ~ 1.5e-9.  1e-6 keeps a stricter-
    # than-OpenCV guard while not freezing low-contrast (dark EuRoC) patches.
    min_eig: float = 1e-6
    max_residual: float = 0.08  # mean abs photometric residual gate ([0,1] images)
    illum_adapt: bool = False  # per-patch gain/bias (line-matcher KLT mode)
    # A hand-written Pallas patch kernel was benchmarked and DELETED in r03:
    # per-feature programs pay ~1 us each (512 features -> 0.58 ms/pass) and
    # Mosaic's (8,128) alignment rules force aligned-superset loads + rolls,
    # while the XLA row-gather + one-hot-matmul superset path costs 0.18 ms/
    # pass and fuses with the rest of the tracker.  See docs/PERF.md.
    use_pallas: bool = False  # retained for config compat; XLA path always wins


def _patch_coords(center, win, dtype):
    r = (win - 1) / 2.0
    g = jnp.arange(win, dtype=dtype) - r
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    return jnp.stack(
        [center[0] + gx, center[1] + gy], axis=-1
    )  # [win, win, 2] (x, y)


def extract_patch(img, center, win):
    """win x win patch at float center via dynamic_slice + fractional blend.

    TPU-friendly replacement for per-pixel gathers: one contiguous
    (win+1)² slice, then a 4-tap blend of shifted views (pure VPU math).
    ~20x cheaper than elementwise bilinear_sample gathers on TPU.
    Positions are clamped at image borders (callers gate validity).
    """
    r = (win - 1) // 2
    x0 = jnp.floor(center[0]) - r
    y0 = jnp.floor(center[1]) - r
    fx = (center[0] - jnp.floor(center[0])).astype(img.dtype)
    fy = (center[1] - jnp.floor(center[1])).astype(img.dtype)
    H, W = img.shape
    xi = jnp.clip(x0.astype(jnp.int32), 0, W - win - 1)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - win - 1)
    big = jax.lax.dynamic_slice(img, (yi, xi), (win + 1, win + 1))
    return (
        big[:-1, :-1] * (1 - fx) * (1 - fy)
        + big[:-1, 1:] * fx * (1 - fy)
        + big[1:, :-1] * (1 - fx) * fy
        + big[1:, 1:] * fx * fy
    )


def _take_row_strips(img, y0, S):
    """[N, S, W] row strips starting at integer rows y0 (pre-clamped).

    A contiguous-row gather: the only full-image access in the tracker.
    """
    N = y0.shape[0]
    rows = y0[:, None] + jnp.arange(S, dtype=y0.dtype)[None, :]
    # clip: coarse pyramid levels can be smaller than the window (old gather
    # clamped too; the duplicated border rows have no gradient -> no update)
    return jnp.take(img, rows.reshape(-1), axis=0, mode="clip").reshape(
        N, S, img.shape[1]
    )


def extract_windows(img, y0, x0, S):
    """[N, S, S] integer-aligned windows at top-left (y0, x0), both [N] int32
    pre-clamped to keep the window inside the image.

    Row gather + one-hot column matmul: ~4x faster than a vmapped
    dynamic_slice gather on TPU (row gathers are contiguous DMAs, the column
    select rides the MXU)."""
    strips = _take_row_strips(img, y0, S)
    ww = jnp.arange(img.shape[1], dtype=jnp.int32)
    Pc = (
        (ww[None, :, None] - x0[:, None, None])
        == jnp.arange(S, dtype=jnp.int32)[None, None, :]
    ).astype(img.dtype)
    return jnp.einsum("nsw,nwc->nsc", strips, Pc,
                      precision=jax.lax.Precision.HIGHEST)


def _grad_inwin(w):
    """Scharr gradients inside [N, S, S] windows via roll shifts (valid on
    the interior; callers keep a 1px margin)."""
    sm = (3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0)
    df = (-1.0, 0.0, 1.0)

    def corr(a, taps, axis):
        out = None
        for i, t in enumerate(taps):
            t = float(t)
            if t == 0.0:
                continue
            term = t * jnp.roll(a, 1 - i, axis=axis)
            out = term if out is None else out + term
        return out

    gx = corr(corr(w, sm, 1), df, 2)
    gy = corr(corr(w, df, 1), sm, 2)
    return gx, gy


def _inwin_extract(wins, tlx, tly, P):
    """Bilinear [N, C, P, P] patches from [N, C, S, S] windows at fractional
    local top-left (tlx, tly) [N], as two-tap one-hot matmuls (batched MXU
    work; ~8x faster than a vmapped dynamic-slice gather on TPU)."""
    S = wins.shape[-1]
    dtype = wins.dtype
    fy = jnp.floor(tly)
    wy = (tly - fy)[:, None, None]
    fx = jnp.floor(tlx)
    wx = (tlx - fx)[:, None, None]
    s = jnp.arange(S, dtype=dtype)
    p = jnp.arange(P, dtype=dtype)
    ry = s[None, None, :] - (fy[:, None, None] + p[None, :, None])  # [N,P,S]
    Pr = (ry == 0) * (1.0 - wy) + (ry == 1) * wy
    rx = s[None, None, :] - (fx[:, None, None] + p[None, :, None])
    Pc = (rx == 0) * (1.0 - wx) + (rx == 1) * wx
    tmp = jnp.einsum("nps,ncsw->ncpw", Pr.astype(dtype), wins,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ncpw,nqw->ncpq", tmp, Pc.astype(dtype),
                      precision=jax.lax.Precision.HIGHEST)


def _gain_bias(I, T):
    """Per-patch gain/bias illumination fit I' = alpha*I + beta matched to
    template stats (line-matcher KLT mode, getImageNormParams)."""
    mI = jnp.mean(I, axis=(-2, -1), keepdims=True)
    mT = jnp.mean(T, axis=(-2, -1), keepdims=True)
    sI = jnp.std(I, axis=(-2, -1), keepdims=True) + 1e-6
    sT = jnp.std(T, axis=(-2, -1), keepdims=True) + 1e-6
    return (I - mI) * (sT / sI) + mT


def _track_level(img0, img1, pts0, guess, cfg: KLTConfig, dtype):
    """One pyramid level of inverse-compositional LK for all N features.

    pts0: [N, 2] template centers in img0; guess: [N, 2] current flow.
    Returns (flow, ok, mean_residual).

    Superset-window formulation (TPU): the template patch + its gradients
    come from one [N, P+3, P+3] window of img0; the moving patch iterates
    INSIDE a [N, P+11, P+11] window of img1 that is re-anchored once
    mid-level, so the 2*iters full-image gathers of a naive port collapse
    into 3 strip-gathers + tiny in-window matmuls (~6x on TPU, where
    scattered gathers are the bottleneck).
    """
    P = cfg.win
    r = (P - 1) / 2.0
    TS = P + 3  # template superset: +1 bilinear, +2 gradient margin
    D = 5  # in-window drift margin per round (px)
    MS = P + 1 + 2 * D

    # zero-pad so window anchors never clamp for in-image features (border /
    # coarse-level patches read zeros, like the old padded gather; zero
    # gradient there -> no spurious update)
    E = int(r) + D + 2
    img0 = jnp.pad(img0, E)
    img1 = jnp.pad(img1, E)
    pts0 = pts0 + E
    H, W = img0.shape

    # ---- template + gradients from one superset ---------------------------
    tl0 = pts0 - r  # fractional top-left of the template patch
    a0x = jnp.clip(jnp.floor(tl0[:, 0]).astype(jnp.int32) - 1, 0, max(W - TS, 0))
    a0y = jnp.clip(jnp.floor(tl0[:, 1]).astype(jnp.int32) - 1, 0, max(H - TS, 0))
    T_ss = extract_windows(img0, a0y, a0x, TS)
    gx_ss, gy_ss = _grad_inwin(T_ss)
    chans = jnp.stack([T_ss, gx_ss, gy_ss], axis=1)
    ltlx = jnp.clip(tl0[:, 0] - a0x.astype(dtype), 0.0, TS - P - 1)
    ltly = jnp.clip(tl0[:, 1] - a0y.astype(dtype), 0.0, TS - P - 1)
    TIxIy = _inwin_extract(chans, ltlx, ltly, P)
    T, Ix, Iy = TIxIy[:, 0], TIxIy[:, 1], TIxIy[:, 2]

    # 2x2 spatial gradient matrix (constant over iterations)
    a = jnp.sum(Ix * Ix, axis=(1, 2))
    b = jnp.sum(Ix * Iy, axis=(1, 2))
    c = jnp.sum(Iy * Iy, axis=(1, 2))
    det = a * c - b * b
    n = P * P
    min_eig = (c + a - jnp.sqrt((a - c) ** 2 + 4.0 * b * b)) / (2.0 * n)
    ok = min_eig > cfg.min_eig
    inv = jnp.stack(
        [jnp.stack([c, -b], -1), jnp.stack([-b, a], -1)], -2
    ) / jnp.where(det > 1e-12, det, 1.0)[:, None, None]

    # ---- moving-window LK iterations, re-anchored once mid-level ----------
    d = guess
    rounds = (cfg.iters // 2, cfg.iters - cfg.iters // 2) if cfg.iters >= 4 else (
        cfg.iters,
    )

    def make_window(dcur):
        ctr = pts0 + dcur
        m0x = jnp.clip(
            jnp.round(ctr[:, 0] - r).astype(jnp.int32) - D, 0, max(W - MS, 0)
        )
        m0y = jnp.clip(
            jnp.round(ctr[:, 1] - r).astype(jnp.int32) - D, 0, max(H - MS, 0)
        )
        return extract_windows(img1, m0y, m0x, MS)[:, None], m0x, m0y

    def extract_moving(M_ss, m0x, m0y, dcur):
        tlx = jnp.clip(
            pts0[:, 0] + dcur[:, 0] - r - m0x.astype(dtype), 0.0, MS - P - 1
        )
        tly = jnp.clip(
            pts0[:, 1] + dcur[:, 1] - r - m0y.astype(dtype), 0.0, MS - P - 1
        )
        return _inwin_extract(M_ss, tlx, tly, P)[:, 0]

    for n_it in rounds:
        M_ss, m0x, m0y = make_window(d)

        def body(_, dcur):
            I = extract_moving(M_ss, m0x, m0y, dcur)
            if cfg.illum_adapt:
                I = _gain_bias(I, T)
            rr = I - T
            g = jnp.stack(
                [jnp.sum(rr * Ix, axis=(1, 2)), jnp.sum(rr * Iy, axis=(1, 2))],
                -1,
            )
            step = jnp.einsum("nij,nj->ni", inv, g)
            return dcur - jnp.where(ok[:, None], step, 0.0)

        d = jax.lax.fori_loop(0, n_it, body, d)

    M_ss, m0x, m0y = make_window(d)
    I = extract_moving(M_ss, m0x, m0y, d)
    if cfg.illum_adapt:
        I = _gain_bias(I, T)
    resid = jnp.mean(jnp.abs(I - T), axis=(1, 2))
    return d, ok, resid


def affine_from_pose(uv_px, depth, R_cr, t_cr, fx, fy, cx, cy, eps=1.0):
    """Local affine warp A = d(uv_cur)/d(uv_ref) in PIXELS at one feature
    (klt.h getAffineModel, the SVO-style patch warp): project the feature and
    two eps-offset pixels through (depth, R_cr, t_cr) where
    x_cur = R_cr x_ref + t_cr.

    uv_px: [2] pixel in the ref frame; depth: scalar z in the ref camera.
    Returns [2, 2].  vmap over features.
    """

    def proj(uv):
        xn = (uv[0] - cx) / fx
        yn = (uv[1] - cy) / fy
        X = jnp.stack([xn, yn, jnp.ones_like(xn)]) * depth
        Xc = R_cr @ X + t_cr
        z = jnp.maximum(Xc[2], 1e-6)
        return jnp.stack([Xc[0] / z * fx + cx, Xc[1] / z * fy + cy])

    p0 = proj(uv_px)
    du = (proj(uv_px + jnp.asarray([eps, 0.0], uv_px.dtype)) - p0) / eps
    dv = (proj(uv_px + jnp.asarray([0.0, eps], uv_px.dtype)) - p0) / eps
    return jnp.stack([du, dv], axis=1)  # columns: d cur / d ref_x, d ref_y


def _track_level_affine(img0, img1, pts0, guess, A_inv, cfg: KLTConfig, dtype):
    """One pyramid level with per-feature AFFINE template warp
    (klt.h getAffineModel / SVO patch warp): the ref patch is sampled at
    p0 + A⁻¹·u for cur-frame patch coords u, so tracking in img1 reduces to
    pure translation; template gradients chain through A⁻¹."""
    gx0, gy0 = scharr_gradients(img0)
    r = (cfg.win - 1) / 2.0
    g = jnp.arange(cfg.win, dtype=dtype) - r
    gy_, gx_ = jnp.meshgrid(g, g, indexing="ij")
    u = jnp.stack([gx_, gy_], axis=-1)  # [win, win, 2] cur-patch offsets
    P = cfg.win
    img1p = jnp.pad(img1, P)
    off = jnp.asarray([P, P], dtype)

    def one(p0, d0, Ai):
        ref_xy = p0[None, None, :] + u @ Ai.T  # [win, win, 2]
        T = bilinear_sample(img0, ref_xy)
        gxT = bilinear_sample(gx0, ref_xy)
        gyT = bilinear_sample(gy0, ref_xy)
        # chain rule: dT/du = Aiᵀ ∇I_ref
        Ix = gxT * Ai[0, 0] + gyT * Ai[1, 0]
        Iy = gxT * Ai[0, 1] + gyT * Ai[1, 1]
        a = jnp.sum(Ix * Ix)
        b = jnp.sum(Ix * Iy)
        c = jnp.sum(Iy * Iy)
        det = a * c - b * b
        n = cfg.win * cfg.win
        min_eig = (c + a - jnp.sqrt((a - c) ** 2 + 4.0 * b * b)) / (2.0 * n)
        ok = min_eig > cfg.min_eig
        inv = (
            jnp.array([[c, -b], [-b, a]], dtype)
            / jnp.where(det > 1e-12, det, 1.0)
        )

        def body(_, d):
            I = extract_patch(img1p, p0 + d + off, cfg.win)
            if cfg.illum_adapt:
                mI, mT = jnp.mean(I), jnp.mean(T)
                sI = jnp.std(I) + 1e-6
                sT = jnp.std(T) + 1e-6
                I = (I - mI) * (sT / sI) + mT
            rr = I - T
            gvec = jnp.stack([jnp.sum(rr * Ix), jnp.sum(rr * Iy)])
            step = jnp.where(ok, inv @ gvec, jnp.zeros(2, dtype))
            return d - step

        d = jax.lax.fori_loop(0, cfg.iters, body, d0)
        I = extract_patch(img1p, p0 + d + off, cfg.win)
        if cfg.illum_adapt:
            mI, mT = jnp.mean(I), jnp.mean(T)
            sI = jnp.std(I) + 1e-6
            sT = jnp.std(T) + 1e-6
            I = (I - mI) * (sT / sI) + mT
        resid = jnp.mean(jnp.abs(I - T))
        return d, ok, resid

    return jax.vmap(one)(pts0, guess, A_inv)


def track(img0, img1, pts0, cfg: KLTConfig = KLTConfig(), init_flow=None,
          affine_inv=None):
    """Track pts0 [N,2] from img0 to img1 through a pyramid.

    affine_inv: optional [N, 2, 2] inverse local affine (maps cur-frame patch
    offsets to ref-frame offsets; see affine_from_pose) enabling the
    reference's getAffineModel patch-warp mode for viewpoint change.
    Returns (pts1 [N,2], ok [N], residual [N]).  Border/occlusion failures are
    flagged, matching the status output of calcOpticalFlowPyrLK.
    """
    dtype = img0.dtype
    N = pts0.shape[0]
    pyr0 = build_pyramid(img0, cfg.levels)
    pyr1 = build_pyramid(img1, cfg.levels)
    scale = 2.0 ** (cfg.levels - 1)
    flow = (
        jnp.zeros_like(pts0) if init_flow is None else init_flow.astype(dtype)
    ) / scale
    ok_all = jnp.ones(N, bool)
    resid = jnp.zeros(N, dtype)
    for lvl in range(cfg.levels - 1, -1, -1):
        s = 2.0**lvl
        if affine_inv is not None:
            # affine offsets are scale-invariant: the same A⁻¹ applies at
            # every pyramid level
            flow, ok, resid = _track_level_affine(
                pyr0[lvl], pyr1[lvl], pts0 / s, flow, affine_inv, cfg, dtype
            )
        else:
            flow, ok, resid = _track_level(
                pyr0[lvl], pyr1[lvl], pts0 / s, flow, cfg, dtype
            )
        # only the finest level's conditioning gates the track: small blobs
        # vanish at coarse levels (no update there), like cv::calcOpticalFlowPyrLK
        if lvl == 0:
            ok_all = ok_all & ok
        if lvl > 0:
            flow = flow * 2.0
    pts1 = pts0 + flow
    H, W = img0.shape
    r = (cfg.win - 1) / 2.0
    inb = (
        (pts1[:, 0] >= r)
        & (pts1[:, 0] < W - r)
        & (pts1[:, 1] >= r)
        & (pts1[:, 1] < H - r)
    )
    ok_all = ok_all & inb & (resid < cfg.max_residual)
    return pts1, ok_all, resid


def track_1d(img0, img1, pts0, dirs, cfg: KLTConfig = KLTConfig(win=15, iters=8)):
    """1D KLT: flow constrained to the given unit direction per feature
    (lk_tracker_invoker_1d.cpp:150-424 — used by the line matcher to slide
    anchor points along the line normal).

    dirs: [N, 2] unit direction of allowed motion.  Returns (pts1, ok, resid).
    """
    dtype = img0.dtype
    pyr0 = build_pyramid(img0, cfg.levels)
    pyr1 = build_pyramid(img1, cfg.levels)

    def level(img0l, img1l, pts, v, s):
        gx0, gy0 = scharr_gradients(img0l)
        P = cfg.win
        img0p = jnp.pad(img0l, P)
        img1p = jnp.pad(img1l, P)
        gx0p = jnp.pad(gx0, P)
        gy0p = jnp.pad(gy0, P)
        off = jnp.asarray([P, P], dtype)

        def one(p0, d, v0):
            T = extract_patch(img0p, p0 + off, cfg.win)
            Ix = extract_patch(gx0p, p0 + off, cfg.win)
            Iy = extract_patch(gy0p, p0 + off, cfg.win)
            # gradient projected on the direction: scalar system
            Id = Ix * d[0] + Iy * d[1]
            a = jnp.sum(Id * Id)
            ok = a / (cfg.win * cfg.win) > cfg.min_eig

            def body(_, v_):
                I = extract_patch(img1p, p0 + v_ * d + off, cfg.win)
                r = I - T
                g = jnp.sum(r * Id)
                return v_ - g / jnp.where(a > 1e-12, a, 1.0)

            v1 = jax.lax.fori_loop(0, cfg.iters, body, v0)
            I = extract_patch(img1p, p0 + v1 * d + off, cfg.win)
            return v1, ok, jnp.mean(jnp.abs(I - T))

        return jax.vmap(one)(pts, dirs, v)

    scale = 2.0 ** (cfg.levels - 1)
    v = jnp.zeros(pts0.shape[0], dtype)
    ok_all = jnp.ones(pts0.shape[0], bool)
    resid = v
    for lvl in range(cfg.levels - 1, -1, -1):
        s = 2.0**lvl
        v, ok, resid = level(pyr0[lvl], pyr1[lvl], pts0 / s, v, s)
        ok_all = ok_all & ok
        if lvl > 0:
            v = v * 2.0
    pts1 = pts0 + v[:, None] * dirs
    ok_all = ok_all & (resid < cfg.max_residual)
    return pts1, ok_all, resid
