"""Jitted Levenberg-Marquardt with Schur-complement landmark elimination.

The single solver engine of the framework — reused by the sliding-window BA,
line-only optimisation, 4-DoF pose graph and GNSS global fusion (replacing
four separate ceres problem setups in the reference:
estimator.cpp:1043-1215 DENSE_SCHUR/DOGLEG, estimator.cpp:950 line-only,
pose_graph.cpp:403-580, globalOpt.cpp:101-260).

TPU-first design:
- The jacobian of the full whitened residual stack is taken with one
  ``jax.jacfwd`` over the flat delta vector (masked rows kill padded
  factors); normal equations are one big MXU matmul.
- Landmarks (scalar inverse depths and 4-dof lines) are eliminated in
  closed form per-block (the dense analogue of the reference's two-stage
  Schur "marg accelerator", marginalization_factor.cpp:281-346), leaving a
  small dense system solved by Cholesky.
- Fixed iteration count with branchless accept/reject damping (no
  data-dependent control flow; the whole solve is one XLA program).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SchurSpec(NamedTuple):
    """Parameter layout: [dense | n_scalar scalar blocks | n_block4 4-dof blocks]."""

    dense_dim: int
    n_scalar: int = 0
    n_block4: int = 0

    @property
    def total_dim(self):
        return self.dense_dim + self.n_scalar + 4 * self.n_block4


class LMConfig(NamedTuple):
    num_iters: int = 8  # reference NUM_ITERATIONS budget (parameters.cpp)
    lambda_init: float = 1e-4
    lambda_down: float = 1.0 / 3.0
    lambda_up: float = 4.0
    lambda_min: float = 1e-10
    lambda_max: float = 1e6
    diag_floor: float = 1e-8


class LMResult(NamedTuple):
    x: object  # optimized state pytree
    cost0: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    grad_norm: jnp.ndarray


def normal_equations(J, r):
    """H = JᵀJ, g = -Jᵀr via one MXU matmul pair."""
    H = J.T @ J
    g = -(J.T @ r)
    return H, g


def _solve_dtype(dtype):
    """f32 inputs solve their (small) normal equations in f64 when possible:
    JᵀJ squares the condition number and float32 loses the low-observability
    directions (bias/velocity) over long runs.

    CPU only — TPU XLA implements LU/eigh for F32 only ("Only F32 and C64
    types are implemented in LuDecomposition"); on TPU the f32 path relies on
    the whitening-range cap in imu.sqrt_information instead."""
    import jax as _jax

    if (
        dtype == jnp.float32
        and _jax.config.jax_enable_x64
        and _jax.default_backend() == "cpu"
    ):
        return jnp.float64
    return dtype


def schur_solve(H, g, spec: SchurSpec, lam, diag_floor=1e-8):
    """Solve (H + λ·D) δ = g by eliminating landmark blocks first.

    Padded (all-zero) landmark slots get a floor on their diagonal so the
    block inverses exist; their gradient is zero, so their delta is zero.
    """
    D = spec.dense_dim
    P = spec.n_scalar
    L = spec.n_block4
    out_dtype = H.dtype
    sd = _solve_dtype(H.dtype)
    H = H.astype(sd)
    g = g.astype(sd)
    lam = jnp.asarray(lam, sd)
    dtype = sd

    # Jacobi preconditioning: the whitened window information spans ~7
    # decades (bias random-walk vs vision), far beyond f32 Cholesky/Schur
    # fidelity — solve in the scaled space where diag(H)=1, unscale delta.
    # (λ·diag damping is scale-invariant, so LM semantics are unchanged.)
    dH = jnp.diag(H)
    c = jnp.where(dH > 1e-30, jnp.sqrt(jnp.maximum(dH, 1e-30)), 1.0)
    H = H / (c[:, None] * c[None, :])
    g = g / c

    diag = jnp.diag(H)
    damp = lam * diag + jnp.asarray(diag_floor, dtype)
    Hd = H + jnp.diag(damp)

    Hdd = Hd[:D, :D]
    g_d = g[:D]

    S = Hdd
    rhs = g_d

    if P > 0:
        Hdp = Hd[:D, D : D + P]  # [D, P]
        hp = jnp.diag(Hd)[D : D + P]  # scalar landmark diagonals (damped)
        g_p = g[D : D + P]
        wp = 1.0 / hp
        S = S - (Hdp * wp[None, :]) @ Hdp.T
        rhs = rhs - Hdp @ (wp * g_p)
    if L > 0:
        Hdl = Hd[:D, D + P :].reshape(D, L, 4)
        Hll = Hd[D + P :, D + P :].reshape(L, 4, L, 4)
        idx = jnp.arange(L)
        Hll_b = Hll[idx, :, idx, :]  # [L, 4, 4] diagonal blocks
        g_l = g[D + P :].reshape(L, 4)
        Wl = jnp.linalg.inv(Hll_b)  # batched 4x4
        S = S - jnp.einsum("dlk,lkm,elm->de", Hdl, Wl, Hdl)
        rhs = rhs - jnp.einsum("dlk,lkm,lm->d", Hdl, Wl, g_l)

    # dense solve (small: D ~ 172)
    cf = jax.scipy.linalg.cho_factor(S, lower=True)
    dd = jax.scipy.linalg.cho_solve(cf, rhs)

    parts = [dd]
    if P > 0:
        dp = wp * (g_p - Hdp.T @ dd)
        parts.append(dp)
    if L > 0:
        dl = jnp.einsum("lkm,lm->lk", Wl, g_l - jnp.einsum("dlk,d->lk", Hdl, dd))
        parts.append(dl.reshape(L * 4))
    return (jnp.concatenate(parts) / c).astype(out_dtype)


def lm_solve(
    residual_fn: Callable,
    retract_fn: Callable,
    x0,
    spec: SchurSpec,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """Fixed-iteration LM.

    residual_fn(x) -> flat whitened residual [R] (masked rows = 0).
    retract_fn(x, delta [N]) -> x' on the manifold.
    """
    dtype = residual_fn(x0).dtype
    N = spec.total_dim

    def cost_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.dot(r, r)

    def linearize(x):
        zero = jnp.zeros(N, dtype)
        r0 = residual_fn(retract_fn(x, zero))
        J = jax.jacfwd(lambda d: residual_fn(retract_fn(x, d)))(zero)
        return r0, J

    cost0 = cost_of(x0)

    def body(_, carry):
        x, lam, cost, gnorm = carry
        r0, J = linearize(x)
        H, g = normal_equations(J, r0)
        delta = schur_solve(H, g, spec, lam, config.diag_floor)
        x_new = retract_fn(x, delta)
        cost_new = cost_of(x_new)
        accept = cost_new < cost
        x = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), x, x_new
        )
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * config.lambda_down, lam * config.lambda_up),
            config.lambda_min,
            config.lambda_max,
        )
        return x, lam, cost, jnp.linalg.norm(g)

    lam0 = jnp.asarray(config.lambda_init, dtype)
    x, lam, cost, gnorm = jax.lax.fori_loop(
        0, config.num_iters, body, (x0, lam0, cost0, jnp.asarray(0.0, dtype))
    )
    return LMResult(x=x, cost0=cost0, cost=cost, lam=lam, grad_norm=gnorm)
