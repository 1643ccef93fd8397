"""Sliding-window marginalization as a square-root prior.

Parity with the reference's ``marginalization_factor.{h,cpp}``:
- dense H = JᵀJ, b = Jᵀr over the factors touching dropped states
  (ThreadsConstructA:144 — here one MXU matmul instead of 4 pthreads),
- Schur elimination of the dropped block via eigendecomposition
  pseudo-inverse (:330-346),
- square-root extraction J_prior = √S·Vᵀ, r_prior = (√S)⁻¹·Vᵀ·b
  (:349-357), replayed next window as a linear prior with first-order
  state update (MarginalizationFactor::Evaluate).

The landmark pre-elimination stage of the reference (:281-327, the "marg
accelerator") is unnecessary here: landmark factors enter this H already
Schur-reduced by the BA layout, and the dense sizes (≤ ~700) are trivial for
the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Prior(NamedTuple):
    """Square-root prior on the dense parameter block.

    residual(x) = r0 + J · (x ⊟ x_lin); rows beyond `rank` are zero-padded
    (fixed shapes).
    """

    J: jnp.ndarray  # [N, N]
    r0: jnp.ndarray  # [N]
    valid: jnp.ndarray  # [] bool — False until the first marginalization


def empty_prior(n, dtype=jnp.float64):
    return Prior(
        J=jnp.zeros((n, n), dtype),
        r0=jnp.zeros((n,), dtype),
        valid=jnp.asarray(False),
    )


def _eps_rel(dtype):
    """Default RELATIVE eigen-clip threshold per dtype.

    The clip must separate true nullspace directions (the window's gauge:
    global translation + yaw, which the factors cannot observe) from
    eigenvalue noise.  That noise scales with ‖H‖·ulp(dtype): an absolute
    1e-8 (the reference's f64 value, marginalization_factor.cpp:334) is
    far below f32 eigh noise on the whitened window problem (‖H‖ ~ 1e6 →
    noise ~ 0.1), so in f32 the gauge directions would survive the clip and
    anchor the window to stale linearization points — measured 10x ATE at
    0.5 px noise (r04 bisect of the r03 full-rank prior).
    """
    return 1e-6 if jnp.dtype(dtype).itemsize <= 4 else 1e-12


def _clip_gate(w, eps, floor=1e-30):
    """Boolean keep-gate for eigenvalues: w > max(eps·max|w|, floor).
    w: [..., K] eigenvalues (ascending); relative per trailing block."""
    wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    return w > jnp.maximum(eps * wmax, floor)


def _col_scale(J, floor=1e-30):
    """Jacobi (diagonal) preconditioner: per-column norms of J, so the
    scaled normal matrix (J/c)ᵀ(J/c) has unit diagonal.

    The window's whitened information spans ~7 decades (bias random-walk
    rows whiten by 1/(σ_w√dt) ~ 1e6 vs vision √info ~ 3e2) — in f32 the
    Schur/eigh noise floor of the RAW JᵀJ sits ABOVE the visual
    information, so the prior silently sheds it and the estimator drifts
    (measured: 0.5 px ATE 1.16 m raw-f32 vs 0.12 m f64; Jacobi-scaled f32
    restores parity).  Zero columns (inactive dims) scale by 1."""
    d = jnp.sum(J * J, axis=0)
    return jnp.where(d > floor, jnp.sqrt(jnp.maximum(d, floor)), 1.0)


def marginalize(J, r, marg_mask, eps=None):
    """Build the square-root prior over kept parameters.

    Args:
      J: [R, N] jacobian of all factors touching the dropped states,
         linearized at the current estimate (whitened, masked rows zero).
      r: [R] residual at the linearization point.
      marg_mask: [N] bool, True for parameters to eliminate.
      eps: RELATIVE eigenvalue threshold for the pseudo-inverses (fraction
         of the largest eigenvalue); None -> dtype-aware default (_eps_rel).

    Returns (J_prior [N, N], r_prior [N]) expressed over the SAME N-dim
    parameter layout, with zero columns on the dropped parameters (keeping
    fixed shapes; the caller then re-maps slots when the window slides).
    """
    from .lm import _solve_dtype

    out_dtype = J.dtype
    dtype = _solve_dtype(J.dtype)  # f64 Schur/eigh when x64 is on (f32 JᵀJ
    # loses the prior's weak directions across repeated marginalizations)
    if eps is None:
        eps = _eps_rel(dtype)
    J = J.astype(dtype)
    r = r.astype(dtype)
    N = J.shape[1]
    # Jacobi preconditioning (see marginalize_window) — mandatory for f32
    c = _col_scale(J)
    J = J / c[None, :]
    H = J.T @ J
    b = J.T @ r

    m = marg_mask.astype(dtype)
    k = 1.0 - m
    # permutation-free Schur: use masked algebra.
    # Amm = H over marg rows/cols (+identity on keep diag so it inverts)
    Amm = H * m[:, None] * m[None, :] + jnp.diag(k)
    # eigendecomposition pseudo-inverse (marginalization_factor.cpp:330-337).
    # NOTE: clipping (not damping!) is load-bearing — a damped Cholesky here
    # leaks a small ABSOLUTE prior onto every direction including the
    # unobservable gauge (global position/yaw), which anchors the window to
    # stale linearization points and was measured to 6x the zero-noise ATE
    # (r03).  The fast path for the structured window problem is
    # marginalize_window below; this generic version keeps exact reference
    # semantics.
    w, V = jnp.linalg.eigh(Amm)
    keep_w = _clip_gate(w, eps)
    w_inv = jnp.where(keep_w, 1.0 / w, 0.0)
    Amm_inv = (V * w_inv[None, :]) @ V.T
    # remove the identity we injected on kept slots
    Amm_inv = Amm_inv * m[:, None] * m[None, :]

    Akm = H * k[:, None] * m[None, :]
    Akk = H * k[:, None] * k[None, :]
    bk = b * k
    bm = b * m

    A_new = Akk - Akm @ Amm_inv @ Akm.T
    b_new = bk - Akm @ (Amm_inv @ bm)

    # square root via eigendecomposition (:349-357)
    w2, V2 = jnp.linalg.eigh(A_new)
    keep2 = _clip_gate(w2, eps)
    w2c = jnp.where(keep2, w2, 0.0)
    s = jnp.sqrt(w2c)
    s_inv = jnp.where(keep2, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    J_prior = (s[:, None] * V2.T) * c[None, :]  # unscale columns
    r_prior = (s_inv[:, None] * V2.T) @ b_new
    return J_prior.astype(out_dtype), r_prior.astype(out_dtype)


def marginalize_window(J, r, nd, dense_start, dense_size,
                       n_points=0, n_lines=0, eps=None):
    """Fast EXACT marginalization for the window's arrow structure.

    Dim layout (static): [0:nd] dense states; dropped dense block =
    [dense_start : dense_start+dense_size]; [nd : nd+n_points] point inverse
    depths (scalar blocks, all dropped); [nd+n_points : +4*n_lines] line
    orth coords (4-blocks, all dropped).  Landmark blocks never couple to
    each other, so the joint pseudo-inverse the generic `marginalize` pays
    two full-size eighs for factors into: per-landmark clipped inverses
    (diagonal / batched 4x4) -> one eigh(dense_size) -> one eigh(keep).
    Same eigen-clipping semantics (marginalization_factor.cpp:330-357), ~30x
    less eigh work at window size.

    Also fixes a latent defect of the generic path: its √-prior rows come
    out in ASCENDING eigenvalue order, so the caller's later [:nd,:nd] crop
    kept mostly zero rows (measured rank 4 of ~90, r03).  Here the rows are
    placed at the kept dims' own indices — the crop is lossless.

    APPROXIMATION NOTE: the per-block eigen-clipping (raw point diagonals,
    per-line eigh(4), then eigh(dense_size)) equals the generic joint-eigh
    clip only when the eliminated blocks are well-conditioned.  A
    near-singular landmark block (e.g. point diagonal ≈ eps from a
    zero-parallax track) clips in a different basis than the joint
    factorization would; both variants zero the unobservable direction, but
    the retained information can differ at O(eps) scale.  The accepted
    divergence is documented by test_marginalization_near_singular
    (tests/test_solver.py); the generic `marginalize` keeps exact reference
    semantics for callers that need them.
    """
    import numpy as np

    from .lm import _solve_dtype

    out_dtype = J.dtype
    dtype = _solve_dtype(J.dtype)
    if eps is None:
        eps = _eps_rel(dtype)
    J = J.astype(dtype)
    r = r.astype(dtype)
    N = J.shape[1]
    # Jacobi preconditioning: all Schur/eigh/clip math runs in the scaled
    # space where diag(H)=1 (see _col_scale); unscaled at the very end
    c = _col_scale(J)
    J = J / c[None, :]
    H = J.T @ J
    b = J.T @ r

    # ---- stage 1: eliminate landmark blocks into the dense block ----------
    H1 = H[:nd, :nd]
    b1 = b[:nd]
    if n_points:
        p0 = nd
        Cp = H[:nd, p0:p0 + n_points]
        dp = jnp.diagonal(H)[p0:p0 + n_points]
        # relative clip over the point population: a near-zero diagonal is an
        # unobserved depth (zero-parallax track), not information
        keep_p = _clip_gate(dp[None, :], eps)[0]
        dpi = jnp.where(keep_p, 1.0 / jnp.maximum(dp, 1e-30), 0.0)
        H1 = H1 - (Cp * dpi[None, :]) @ Cp.T
        b1 = b1 - Cp @ (dpi * b[p0:p0 + n_points])
    if n_lines:
        q0 = nd + n_points
        L = n_lines
        Cl = H[:nd, q0:q0 + 4 * L].reshape(nd, L, 4)
        Hll = H[q0:q0 + 4 * L, q0:q0 + 4 * L].reshape(L, 4, L, 4)
        Dl = Hll[jnp.arange(L), :, jnp.arange(L), :]  # [L, 4, 4]
        wl, Vl = jnp.linalg.eigh(Dl)
        keep_l = _clip_gate(wl, eps)  # per-block relative
        wli = jnp.where(keep_l, 1.0 / jnp.maximum(wl, 1e-30), 0.0)
        Dli = jnp.einsum("lab,lb,lcb->lac", Vl, wli, Vl)
        H1 = H1 - jnp.einsum("nla,lab,mlb->nm", Cl, Dli, Cl)
        b1 = b1 - jnp.einsum("nla,lab,lb->n", Cl, Dli,
                             b[q0:q0 + 4 * L].reshape(L, 4))

    # ---- stage 2: eliminate the dropped dense block (eigh(dense_size)) ----
    midx = np.arange(dense_start, dense_start + dense_size)
    kidx = np.concatenate([
        np.arange(0, dense_start), np.arange(dense_start + dense_size, nd)
    ])
    P00 = H1[np.ix_(midx, midx)]
    Q = H1[np.ix_(kidx, midx)]
    w0, V0 = jnp.linalg.eigh(P00)
    keep0 = _clip_gate(w0, eps)
    w0i = jnp.where(keep0, 1.0 / jnp.maximum(w0, 1e-30), 0.0)
    P00i = (V0 * w0i[None, :]) @ V0.T
    A_new = H1[np.ix_(kidx, kidx)] - Q @ P00i @ Q.T
    b_new = b1[kidx] - Q @ (P00i @ b1[midx])
    A_new = 0.5 * (A_new + A_new.T)

    # ---- stage 3: square root on the kept block (eigh(keep)) --------------
    w2, V2 = jnp.linalg.eigh(A_new)
    keep2 = _clip_gate(w2, eps)
    w2c = jnp.where(keep2, w2, 0.0)
    s = jnp.sqrt(w2c)
    s_inv = jnp.where(keep2, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    Jk = (s[:, None] * V2.T) * c[kidx][None, :]  # unscale columns
    rk = (s_inv[:, None] * V2.T) @ b_new

    J_prior = jnp.zeros((N, N), dtype).at[np.ix_(kidx, kidx)].set(Jk)
    r_prior = jnp.zeros((N,), dtype).at[kidx].set(rk)
    return J_prior.astype(out_dtype), r_prior.astype(out_dtype)


def project_out_nullspace(J, Nbasis, keep=None):
    """Remove information along known-unobservable directions: J ← J(I−UUᵀ)
    with U an orthonormal basis of span(Nbasis) RESTRICTED to the kept dims.

    The window's factors cannot observe global translation and yaw (the
    4-dim gauge), so the EXACT prior has zero information there — but f32
    Schur/eigh noise re-injects spurious gauge stiffness that anchors the
    window to stale linearization points (the classic VIO spurious-
    information inconsistency, amplified at f32).  Projecting the analytic
    nullspace out of the √-prior makes the guarantee dtype-independent.

    The prior's just-eliminated dims have zero columns; orthonormalizing the
    FULL-space basis would leave Q components on those dims, making the
    kept-subspace cleanup inexact and writing nonzero entries into the
    eliminated columns (r4 advisor finding).  The basis rows are therefore
    masked to the dims the prior actually touches (``keep``; derived from
    J's column norms when not given), and orthonormalized by SVD so that
    basis columns annihilated by the mask drop out instead of polluting U
    with junk directions (QR would return garbage orthonormal vectors for
    near-zero columns).
    """
    dtype = J.dtype
    if keep is None:
        # RELATIVE threshold: eliminated columns may carry O(ulp) dust from
        # upstream factorizations; an exact-zero test would flip them into
        # the kept set and silently un-restrict the basis
        d = jnp.sum(J * J, axis=0)
        keep = d > 1e-12 * jnp.max(d)
    Nb = Nbasis.astype(dtype) * keep[:, None].astype(dtype)
    U, s, _ = jnp.linalg.svd(Nb, full_matrices=False)
    ok = s > 1e-6 * jnp.maximum(jnp.max(s), 1e-30)
    U = U * ok[None, :].astype(dtype)
    return J - (J @ U) @ U.T


def prior_residual(prior: Prior, dx):
    """Evaluate the prior residual given the manifold difference dx = x ⊟ x_lin."""
    r = prior.r0 + prior.J @ dx
    return jnp.where(prior.valid, r, jnp.zeros_like(r))


def shift_prior(prior: Prior, perm):
    """Re-index prior columns when the window slides (parameter slot j of the
    new layout corresponds to old slot perm[j]; dropped slots map to -1).

    The reference rebuilds keep_block addresses after each slide
    (marginalization_factor.cpp getParameterBlocks); with fixed-slot tensors
    this is a gather over columns.
    """
    cols = jnp.where(perm >= 0, perm, 0)
    J_new = prior.J[:, cols] * (perm >= 0)[None, :].astype(prior.J.dtype)
    return prior._replace(J=J_new)
