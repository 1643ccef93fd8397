"""Multi-view geometry ops: essential matrix, PnP, triangulation.

Mask-aware, fixed-shape, batched replacements for the reference's OpenCV
calls: ``cv::findFundamentalMat`` (solve_5pts.cpp solveRelativeRT),
``cv::solvePnP`` (initial_sfm.cpp solveFrameByPnP, estimator.cpp:432-501),
two-frame / multi-view SVD triangulation (initial_sfm.cpp
triangulateTwoFrames, feature_manager.cpp:565-621).

Everything operates on normalized image coordinates (z=1 rays).  Masked
entries contribute zero rows to the normal matrices, so padding never
changes results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.geometry import quat_rotate, rot_to_quat, skew


def _solve3x3(H, g):
    """Closed-form (adjugate/Cramer) 3x3 solve — batched-friendly pure VPU
    math, avoiding the pivoted-LU while_loop jnp.linalg.solve emits."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g0, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g0 - d * i
    A11 = a * i - c * g0
    A12 = c * d - a * f
    A20 = d * h - e * g0
    A21 = b * g0 - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    x0 = (A00 * g[..., 0] + A01 * g[..., 1] + A02 * g[..., 2]) * inv_det
    x1 = (A10 * g[..., 0] + A11 * g[..., 1] + A12 * g[..., 2]) * inv_det
    x2 = (A20 * g[..., 0] + A21 * g[..., 1] + A22 * g[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def _smallest_eigvec(A):
    """Unit eigenvector of symmetric A for the smallest eigenvalue."""
    w, V = jnp.linalg.eigh(A)
    return V[..., :, 0]


def eight_point_essential(x1, x2, mask):
    """Essential matrix from ≥8 correspondences on the normalized plane.

    x1, x2: [N, 2] normalized coords in frames 1, 2; mask: [N] weights.
    Returns E with the essential constraint enforced (σ1=σ2=1, σ3=0),
    satisfying x2ᵀ E x1 = 0 (x as homogeneous rays).
    """
    m = mask.astype(x1.dtype)[:, None]
    one = jnp.ones_like(x1[:, :1])
    h1 = jnp.concatenate([x1, one], axis=-1)
    h2 = jnp.concatenate([x2, one], axis=-1)
    # rows of the linear system: kron(h1, h2) ordered so that vec picks E
    A = (h2[:, :, None] * h1[:, None, :]).reshape(-1, 9) * m
    e = _smallest_eigvec(A.T @ A)
    E = e.reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    s_fixed = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return U @ jnp.diag(s_fixed) @ Vt


def decompose_essential(E, x1, x2, mask):
    """Four-way decomposition + cheirality vote.

    Returns (R, t) with ‖t‖=1 mapping frame-1 coords to frame-2:
    x2 ~ R @ x1 + t (the relative pose frame1->frame2).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t1 = U[:, 2]

    def count_cheirality(R, t):
        z1, z2 = _two_view_depths(R, t, x1, x2)
        good = (z1 > 0) & (z2 > 0) & mask
        return jnp.sum(good.astype(jnp.int32))

    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t1, -t1, t1, -t1])
    votes = jax.vmap(count_cheirality)(cands_R, cands_t)
    best = jnp.argmax(votes)
    return cands_R[best], cands_t[best], votes[best]


def _two_view_depths(R, t, x1, x2):
    """Depths of midpoint triangulation given x2 ~ R x1 + t."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)
    r1 = jax.vmap(lambda a: R @ a)(h1)  # ray 1 in frame 2
    # solve [r1, -h2] [z1; z2] = -t in least squares per correspondence
    def solve(a, b):
        M = jnp.stack([a, -b], axis=-1)  # [3,2]
        z = jnp.linalg.lstsq(M, -t)[0]
        return z[0], z[1]

    z1, z2 = jax.vmap(solve)(r1, h2)
    return z1, z2


def triangulate_two_view(R, t, x1, x2):
    """DLT triangulation in frame 1 given relative pose x2 ~ R x1 + t.

    Returns (X1 [N,3] points in frame 1, depth in frame 1).
    """
    P1 = jnp.concatenate([jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], 1)
    P2 = jnp.concatenate([R, t[:, None]], 1)

    def tri(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        X = _smallest_eigvec(A.T @ A)
        return X[:3] / X[3]

    X1 = jax.vmap(tri)(x1, x2)
    return X1, X1[:, 2]


def triangulate_tracks(poses_R, poses_t, obs, mask):
    """Multi-view SVD triangulation of many tracks (feature_manager.cpp:565).

    poses_R/poses_t: [F, 3, 3]/[F, 3] camera-from-world (x_c = R x_w + t).
    obs: [N, F, 2] normalized observations; mask [N, F].
    Returns (X_w [N, 3], ok [N]) — ok requires ≥2 observations.
    """
    P = jnp.concatenate([poses_R, poses_t[..., :, None]], axis=-1)  # [F,3,4]

    def one(o, m):
        # rows: u*P2-P0, v*P2-P1 per frame, masked
        r0 = o[:, 0:1] * P[:, 2, :] - P[:, 0, :]
        r1 = o[:, 1:2] * P[:, 2, :] - P[:, 1, :]
        A = jnp.concatenate([r0, r1], axis=0) * jnp.concatenate([m, m])[:, None]
        # affine-normalized DLT (w=1): min ||B X + b|| -> 3x3 normal solve,
        # ~20x cheaper on TPU than the 4x4 eigh the homogeneous form needs
        # (eigh lowers to an iterative QR program; this is pure VPU math).
        # Low-parallax degeneracy is handled by the conditioning gate below
        # (the homogeneous form returns w->0 = "point at infinity" there; the
        # affine solve has no such graceful mode, so it must DECLINE instead
        # and let the track retry once more baseline accrues).
        B, b = A[:, 0:3], A[:, 3]
        H = B.T @ B
        tr = jnp.trace(H) / 3.0
        Hd = H + 1e-10 * tr * jnp.eye(3, dtype=A.dtype)
        X = -_solve3x3(Hd, B.T @ b)
        # relative conditioning gate: det/tr³ ≈ 3.4·(λ_min/λ_max) for the
        # near-rank-2 low-parallax case, so the threshold bounds the depth
        # noise amplification by cond(H).  f32 needs a much stronger gate
        # than f64: at eps=1e-9 it accepts cond up to ~1e8, far beyond f32
        # solve fidelity — garbage depths then pass the z>0.1 sanity check
        # and drag the window BA (r04: n1-noise ATE wander).
        eps_tri = 1e-9 if jnp.dtype(A.dtype).itemsize > 4 else 3e-5
        det = jnp.linalg.det(Hd)
        good = det > eps_tri * jnp.maximum(tr, 1e-30) ** 3
        return X, good

    X, cond_ok = jax.vmap(one)(obs, mask.astype(obs.dtype))
    X = jnp.where(jnp.isfinite(X), X, 0.0)
    ok = (jnp.sum(mask, axis=1) >= 2) & cond_ok
    return X, ok


def pnp_dlt(X_w, x, mask):
    """Linear PnP (DLT) with rotation re-orthonormalization.

    X_w: [N,3] world points; x: [N,2] normalized observations; mask: [N].
    Returns (R, t): x ~ R X_w + t, plus a validity flag (≥6 points).
    """
    m = mask.astype(x.dtype)

    def rows(Xp, u, w):
        X_h = jnp.concatenate([Xp, jnp.ones(1, Xp.dtype)])
        z = jnp.zeros(4, Xp.dtype)
        r0 = jnp.concatenate([X_h, z, -u[0] * X_h]) * w
        r1 = jnp.concatenate([z, X_h, -u[1] * X_h]) * w
        return jnp.stack([r0, r1])

    A = jax.vmap(rows)(X_w, x, m).reshape(-1, 12)
    p = _smallest_eigvec(A.T @ A)
    Pm = p.reshape(3, 4)
    # fix sign: average depth positive
    depths = jax.vmap(lambda Xp: Pm[2] @ jnp.concatenate([Xp, jnp.ones(1, Xp.dtype)]))(X_w)
    sign = jnp.sign(jnp.sum(depths * m) + 1e-30)
    Pm = Pm * sign
    M = Pm[:, :3]
    # scale so that R is a rotation: det(M) > 0, unit-ize via SVD
    U, s, Vt = jnp.linalg.svd(M)
    scale = jnp.mean(s)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    t = Pm[:, 3] / scale
    ok = jnp.sum(mask) >= 6
    return R, t, ok


def pnp_refine(R0, t0, X_w, x, mask, iters=5):
    """Gauss-Newton refinement of a PnP pose on SE(3) (replaces OpenCV's
    iterative solvePnP refinement)."""
    dtype = x.dtype

    def residual(params):
        w, t = params[:3], params[3:]
        from ..utils.geometry import so3_exp_matrix

        R = so3_exp_matrix(w) @ R0
        Xc = jax.vmap(lambda Xp: R @ Xp + t)(X_w)
        proj = Xc[:, :2] / Xc[:, 2:3]
        return ((proj - x) * mask.astype(dtype)[:, None]).reshape(-1)

    params = jnp.concatenate([jnp.zeros(3, dtype), t0])

    def body(_, params):
        r = residual(params)
        J = jax.jacfwd(residual)(params)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=dtype)
        return params - jnp.linalg.solve(H, J.T @ r)

    params = jax.lax.fori_loop(0, iters, body, params)
    from ..utils.geometry import so3_exp_matrix

    return so3_exp_matrix(params[:3]) @ R0, params[3:]


def ransac_pnp(X_w, x, mask, key, n_hyp=32, threshold=8.0 / 460.0, min_pts=6):
    """Fixed-trial batched PnP-RANSAC (cv::solvePnPRansac parity,
    keyframe.cpp PnPRANSAC:200): n_hyp 6-point DLT hypotheses scored by
    reprojection inliers, best refined by Gauss-Newton on all inliers.

    Returns (R, t, inlier_mask, n_inliers) with x ~ project(R X_w + t).
    """
    N = X_w.shape[0]
    dtype = x.dtype
    order = jnp.argsort(~mask)
    n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), min_pts)
    idx = jax.random.randint(key, (n_hyp, min_pts), 0, N)
    idx = order[idx % n_valid]

    def hyp(sample):
        sm = jnp.zeros(N, bool).at[sample].set(True) & mask
        R, t, ok = pnp_dlt(X_w, x, sm)
        return R, t

    Rs, ts = jax.vmap(hyp)(idx)

    def score(R, t):
        Xc = X_w @ R.T + t
        good_z = Xc[:, 2] > 0.05
        proj = Xc[:, :2] / jnp.where(good_z, Xc[:, 2], 1.0)[:, None]
        err = jnp.linalg.norm(proj - x, axis=-1)
        inl = (err < threshold) & mask & good_z
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    R_b, t_b, inl_b = Rs[best], ts[best], inls[best]
    R_f, t_f = pnp_refine(R_b, t_b, X_w, x, inl_b)
    n_f, inl_f = score(R_f, t_f)
    return R_f, t_f, inl_f, n_f


def ransac_essential(x1, x2, mask, key, n_hyp=64, threshold=3.0 / 460.0):
    """Fixed-trial batched RANSAC for the essential matrix.

    The reference's cv::findFundamentalMat(FM_RANSAC, F_THRESHOLD=1px @460
    virtual focal) (feature_tracker.cpp rejectWithF:226, solve_5pts.cpp:10)
    recast as n_hyp parallel 8-point hypotheses scored by Sampson distance —
    data-dependent iteration becomes one batched kernel.

    Returns (E_best, inlier_mask, n_inliers).
    """
    N = x1.shape[0]
    dtype = x1.dtype
    idx = jax.random.randint(key, (n_hyp, 8), 0, N)
    valid_prob = mask.astype(dtype) + 1e-6
    # bias sampling toward valid entries by resampling indices from valid set:
    # order valid first, sample within [0, n_valid)
    order = jnp.argsort(~mask)  # valid first
    n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 8)
    idx = order[idx % n_valid]

    def hyp(sample):
        sm = jnp.zeros(N, bool).at[sample].set(True) & mask
        return eight_point_essential(x1, x2, sm)

    Es = jax.vmap(hyp)(idx)

    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)

    def score(E):
        Ex1 = h1 @ E.T  # [N,3] = E @ h1 rowwise
        Etx2 = h2 @ E  # [N,3] = Eᵀ @ h2
        num = jnp.sum(h2 * Ex1, axis=-1)
        sampson = num * num / (
            Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2 + 1e-18
        )
        inl = (sampson < threshold * threshold) & mask
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inls = jax.vmap(score)(Es)
    best = jnp.argmax(counts)
    # final least-squares re-estimation on ALL inliers of the best minimal
    # hypothesis (cv::findFundamentalMat's 8-point refit; an 8-sample E
    # carries 2-5x the rotation noise of the full-inlier-set fit — measured
    # on the mh04 fixture pairs).  Kept only if it does not lose inliers.
    E_ref = eight_point_essential(x1, x2, inls[best])
    n_ref, inl_ref = score(E_ref)
    better = n_ref >= counts[best]
    E_out = jnp.where(better, E_ref, Es[best])
    inl_out = jnp.where(better, inl_ref, inls[best])
    return E_out, inl_out, jnp.maximum(n_ref, counts[best])
