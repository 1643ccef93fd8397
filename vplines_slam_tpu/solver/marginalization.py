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


def marginalize(J, r, marg_mask, eps=1e-8):
    """Build the square-root prior over kept parameters.

    Args:
      J: [R, N] jacobian of all factors touching the dropped states,
         linearized at the current estimate (whitened, masked rows zero).
      r: [R] residual at the linearization point.
      marg_mask: [N] bool, True for parameters to eliminate.
      eps: eigenvalue threshold for the pseudo-inverses.

    Returns (J_prior [N, N], r_prior [N]) expressed over the SAME N-dim
    parameter layout, with zero columns on the dropped parameters (keeping
    fixed shapes; the caller then re-maps slots when the window slides).
    """
    from .lm import _solve_dtype

    out_dtype = J.dtype
    dtype = _solve_dtype(J.dtype)  # f64 Schur/eigh when x64 is on (f32 JᵀJ
    # loses the prior's weak directions across repeated marginalizations)
    J = J.astype(dtype)
    r = r.astype(dtype)
    N = J.shape[1]
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
    w_inv = jnp.where(w > eps, 1.0 / w, 0.0)
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
    w2c = jnp.where(w2 > eps, w2, 0.0)
    s = jnp.sqrt(w2c)
    s_inv = jnp.where(w2 > eps, 1.0 / s, 0.0)
    J_prior = s[:, None] * V2.T
    r_prior = (s_inv[:, None] * V2.T) @ b_new
    return J_prior.astype(out_dtype), r_prior.astype(out_dtype)


def marginalize_window(J, r, nd, dense_start, dense_size,
                       n_points=0, n_lines=0, eps=1e-8):
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
    J = J.astype(dtype)
    r = r.astype(dtype)
    N = J.shape[1]
    H = J.T @ J
    b = J.T @ r

    # ---- stage 1: eliminate landmark blocks into the dense block ----------
    H1 = H[:nd, :nd]
    b1 = b[:nd]
    if n_points:
        p0 = nd
        Cp = H[:nd, p0:p0 + n_points]
        dp = jnp.diagonal(H)[p0:p0 + n_points]
        dpi = jnp.where(dp > eps, 1.0 / dp, 0.0)
        H1 = H1 - (Cp * dpi[None, :]) @ Cp.T
        b1 = b1 - Cp @ (dpi * b[p0:p0 + n_points])
    if n_lines:
        q0 = nd + n_points
        L = n_lines
        Cl = H[:nd, q0:q0 + 4 * L].reshape(nd, L, 4)
        Hll = H[q0:q0 + 4 * L, q0:q0 + 4 * L].reshape(L, 4, L, 4)
        Dl = Hll[jnp.arange(L), :, jnp.arange(L), :]  # [L, 4, 4]
        wl, Vl = jnp.linalg.eigh(Dl)
        wli = jnp.where(wl > eps, 1.0 / wl, 0.0)
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
    w0i = jnp.where(w0 > eps, 1.0 / w0, 0.0)
    P00i = (V0 * w0i[None, :]) @ V0.T
    A_new = H1[np.ix_(kidx, kidx)] - Q @ P00i @ Q.T
    b_new = b1[kidx] - Q @ (P00i @ b1[midx])
    A_new = 0.5 * (A_new + A_new.T)

    # ---- stage 3: square root on the kept block (eigh(keep)) --------------
    w2, V2 = jnp.linalg.eigh(A_new)
    w2c = jnp.where(w2 > eps, w2, 0.0)
    s = jnp.sqrt(w2c)
    s_inv = jnp.where(w2 > eps, 1.0 / s, 0.0)
    Jk = s[:, None] * V2.T
    rk = (s_inv[:, None] * V2.T) @ b_new

    J_prior = jnp.zeros((N, N), dtype).at[np.ix_(kidx, kidx)].set(Jk)
    r_prior = jnp.zeros((N,), dtype).at[kidx].set(rk)
    return J_prior.astype(out_dtype), r_prior.astype(out_dtype)


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
