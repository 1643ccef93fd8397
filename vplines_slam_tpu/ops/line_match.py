"""Frame-to-frame line matching: anchor tracking + voting + topological filter.

Parity with the reference's matcher (``line_matching/src/line_matching.cpp``)
— explicitly NOT LBD descriptors: anchor keypoints are sampled every
``step=10`` px along each previous-frame segment (Anchors:532), tracked by
KLT (the custom SIMD tracker -> ops/klt here), assigned to the nearest
current segment (ClosestLine:48), point votes become line votes by majority
ratio 0.4 (Point2Line:88), and pairwise sideness/ordering consistency drops
topology violators (TopologicalFilter:267, SidenessCheck:412).

All stages are fixed-shape batched tensor ops: anchors [L, A], the vote is a
one-hot matmul, the topological check is an [M, M] pairwise pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import klt as klt_mod


class LineMatchConfig(NamedTuple):
    anchors_per_line: int = 8  # fixed anchor capacity (step≈10px on ≤80px lines)
    anchor_step: float = 10.0
    max_point_line_dist: float = 4.0  # px, ClosestLine gate
    vote_ratio: float = 0.4  # Point2Line majority ratio
    min_votes: int = 2
    # min_eig is relaxed: line-edge patches are inherently 1D (aperture), and
    # only the perpendicular flow component matters for line assignment —
    # the along-line component cancels in point_to_segment_dist
    klt: klt_mod.KLTConfig = klt_mod.KLTConfig(
        win=15, levels=3, iters=8, illum_adapt=True, min_eig=1e-6
    )


def sample_anchors(segs, valid, cfg: LineMatchConfig):
    """[L, A, 2] anchor points uniformly spaced along each segment, with mask
    honouring the ~step spacing (Anchors:532)."""
    L = segs.shape[0]
    A = cfg.anchors_per_line
    p1 = segs[:, 0:2]
    p2 = segs[:, 2:4]
    length = jnp.linalg.norm(p2 - p1, axis=-1)
    t = (jnp.arange(A, dtype=segs.dtype) + 0.5) / A  # [A]
    pts = p1[:, None, :] + (p2 - p1)[:, None, :] * t[None, :, None]
    # use ceil(length/step) anchors, at most A
    n_anchor = jnp.clip(
        jnp.ceil(length / cfg.anchor_step).astype(jnp.int32), 2, A
    )
    amask = (jnp.arange(A)[None, :] < n_anchor[:, None]) & valid[:, None]
    return pts, amask


def point_to_segment_dist(p, a, b):
    """Distance from p to segment ab (used for ClosestLine assignment)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(
        jnp.sum(ab * ab, axis=-1), 1e-12
    )
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def match_lines(
    img0, img1, segs0, valid0, segs1, valid1,
    cfg: LineMatchConfig = LineMatchConfig(), warp=None,
):
    """Match previous-frame segments to current-frame segments.

    warp: optional pose prior (R_cr, t_cr, depth, fx, fy, cx, cy) enabling
    the reference's affine patch-warp KLT (klt.h getAffineModel): R_cr/t_cr
    map ref-camera coords to cur-camera coords; depth is a scalar (or [L0])
    scene-depth guess for the anchors.
    Returns (match [L0] int32 index into segs1 or -1, n_votes [L0]).
    """
    L0 = segs0.shape[0]
    L1 = segs1.shape[0]
    A = cfg.anchors_per_line

    anchors, amask = sample_anchors(segs0, valid0, cfg)  # [L0, A, 2]
    flat = anchors.reshape(L0 * A, 2)
    affine_inv = None
    if warp is not None:
        R_cr, t_cr, depth, fx, fy, cx, cy = warp
        depth = jnp.broadcast_to(jnp.asarray(depth, segs0.dtype), (L0,))
        depth_flat = jnp.repeat(depth, A)
        Aff = jax.vmap(
            lambda uv, z: klt_mod.affine_from_pose(uv, z, R_cr, t_cr, fx, fy, cx, cy)
        )(flat, depth_flat)
        affine_inv = jnp.linalg.inv(
            Aff + 1e-6 * jnp.eye(2, dtype=segs0.dtype)
        )
    tracked, ok, _ = klt_mod.track(img0, img1, flat, cfg.klt, affine_inv=affine_inv)
    tracked = tracked.reshape(L0, A, 2)
    ok = ok.reshape(L0, A) & amask

    # distance of each tracked anchor to every current segment: [L0, A, L1]
    d = jax.vmap(
        lambda pts: jax.vmap(
            lambda p: point_to_segment_dist(
                p[None, :], segs1[:, 0:2], segs1[:, 2:4]
            )[0]
            if False
            else point_to_segment_dist(
                jnp.broadcast_to(p, (L1, 2)), segs1[:, 0:2], segs1[:, 2:4]
            )
        )(pts)
    )(tracked)
    d = jnp.where(valid1[None, None, :], d, jnp.inf)
    nearest = jnp.argmin(d, axis=-1)  # [L0, A]
    near_ok = (jnp.min(d, axis=-1) < cfg.max_point_line_dist) & ok

    # votes[l0, l1] = #anchors of l0 assigned to l1 (one-hot matmul)
    onehot = jax.nn.one_hot(nearest, L1, dtype=segs0.dtype) * near_ok[..., None]
    votes = jnp.sum(onehot, axis=1)  # [L0, L1]
    best = jnp.argmax(votes, axis=-1)
    n_votes = jnp.max(votes, axis=-1)
    # ratio over successfully TRACKED anchors (Point2Line:88 divides by the
    # tracked count, not the sampled count)
    n_tracked = jnp.maximum(jnp.sum(ok, axis=1), 1)
    accept = (
        valid0
        & (n_votes >= cfg.min_votes)
        & (n_votes / n_tracked >= cfg.vote_ratio)
    )
    match = jnp.where(accept, best, -1)

    # resolve duplicate targets: keep the match with the most votes per target
    tgt_onehot = jax.nn.one_hot(
        jnp.where(match >= 0, match, L1), L1 + 1, dtype=segs0.dtype
    )
    votes_per_tgt = tgt_onehot * n_votes[:, None]
    best_src = jnp.argmax(votes_per_tgt, axis=0)  # [L1+1]
    keep = best_src[jnp.where(match >= 0, match, L1)] == jnp.arange(L0)
    match = jnp.where(keep, match, -1)

    match = topological_filter(segs0, segs1, match, cfg)
    return match, n_votes


def _side(seg, p):
    """Sign of point p relative to directed segment (SidenessCheck core)."""
    d = seg[2:4] - seg[0:2]
    v = p - seg[0:2]
    return jnp.sign(d[0] * v[1] - d[1] * v[0])


def topological_filter(segs0, segs1, match, cfg):
    """Drop matches whose pairwise sideness flips between frames
    (TopologicalFilter:267-410): midpoint of line j must stay on the same
    side of line i in both frames for consistent pairs."""
    L0 = segs0.shape[0]
    mid0 = 0.5 * (segs0[:, 0:2] + segs0[:, 2:4])
    msafe = jnp.where(match >= 0, match, 0)
    m1 = segs1[msafe]
    mid1 = 0.5 * (m1[:, 0:2] + m1[:, 2:4])
    valid = match >= 0

    s0 = jax.vmap(
        lambda i: jax.vmap(lambda j: _side(segs0[i], mid0[j]))(jnp.arange(L0))
    )(jnp.arange(L0))
    s1 = jax.vmap(
        lambda i: jax.vmap(lambda j: _side(m1[i], mid1[j]))(jnp.arange(L0))
    )(jnp.arange(L0))
    pair_ok = (s0 == s1) | ~valid[None, :] | ~valid[:, None]
    eye = jnp.eye(L0, dtype=bool)
    pair_ok = pair_ok | eye
    # consistency score: fraction of consistent pairs with other valid matches
    n_other = jnp.maximum(jnp.sum(valid) - 1, 1)
    consist = (jnp.sum(pair_ok & valid[None, :], axis=1) - 1) / n_other
    keep = valid & (consist >= 0.6)
    return jnp.where(keep, match, -1)
