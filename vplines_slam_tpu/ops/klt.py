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
    min_eig: float = 1e-4  # spatial-gradient conditioning threshold
    max_residual: float = 0.08  # mean abs photometric residual gate ([0,1] images)
    illum_adapt: bool = False  # per-patch gain/bias (line-matcher KLT mode)
    use_pallas: bool = False  # TPU kernel path (ops/klt_pallas); no illum_adapt


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


def _track_level(img0, img1, pts0, guess, cfg: KLTConfig, dtype):
    """One pyramid level of inverse-compositional LK for all N features.

    pts0: [N, 2] template centers in img0; guess: [N, 2] current flow.
    Returns (flow, ok, mean_residual).
    """
    gx0, gy0 = scharr_gradients(img0)
    # pad so patch slices never clamp (coarse levels can be smaller than the
    # window); zero padding matches the old gather's out-of-bounds behaviour
    P = cfg.win
    img0p = jnp.pad(img0, P)
    img1p = jnp.pad(img1, P)
    gx0p = jnp.pad(gx0, P)
    gy0p = jnp.pad(gy0, P)
    off = jnp.asarray([P, P], dtype)

    def one(p0, d0):
        T = extract_patch(img0p, p0 + off, cfg.win)
        Ix = extract_patch(gx0p, p0 + off, cfg.win)
        Iy = extract_patch(gy0p, p0 + off, cfg.win)
        # 2x2 spatial gradient matrix (constant over iterations)
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
                # gain/bias fit: I' = alpha*I + beta matched to template stats
                mI, mT = jnp.mean(I), jnp.mean(T)
                sI = jnp.std(I) + 1e-6
                sT = jnp.std(T) + 1e-6
                I = (I - mI) * (sT / sI) + mT
            r = I - T
            g = jnp.stack([jnp.sum(r * Ix), jnp.sum(r * Iy)])
            # ill-conditioned patches keep their flow instead of exploding
            step = jnp.where(ok, inv @ g, jnp.zeros(2, dtype))
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

    return jax.vmap(one)(pts0, guess)


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
        elif cfg.use_pallas:
            from .image import scharr_gradients
            from .klt_pallas import track_level_pallas

            gx, gy = scharr_gradients(pyr0[lvl])
            flow, ok, resid = track_level_pallas(
                pyr0[lvl], pyr1[lvl], gx, gy,
                (pts0 / s).astype(jnp.float32), flow.astype(jnp.float32),
                win=cfg.win, iters=cfg.iters, min_eig=cfg.min_eig,
            )
            flow = flow.astype(dtype)
            resid = resid.astype(dtype)
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
