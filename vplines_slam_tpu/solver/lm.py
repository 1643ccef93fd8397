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


class WindowLayout(NamedTuple):
    """Static row/column layout of the window residual stack — the key to a
    LINEAR-in-landmarks linearization.

    ``window_residuals`` stacks [prior nd | imu (nf-1)·15 | points P·nf·2 |
    lines L·nf·2 | vps L·nf·2 | relo P·2] and every row depends on at most
    ONE landmark (its own slot's inverse depth or 4-dof line).  Therefore:
    - ONE jvp with tangent 1 on every scalar-landmark dim recovers ALL point
      columns at once (rows are disjoint in their landmark dependence), and
    - FOUR jvps (one per orth component, tangent 1 on every line) recover
      all line columns,
    so the full linearization costs nd + 5 jvps instead of nd + P + 4L —
    the difference between 98.5 ms and ~7 ms at 1024 landmarks (r5 bench).
    The dense-landmark coupling blocks are then assembled by static
    reshapes (no scatters): H_dp, h_p, H_dl, Hll_b — exactly the quantities
    the Schur solve consumes, so the [R, N] jacobian and the N×N Hessian
    are never materialized.
    """

    nd: int
    nf: int
    P: int
    L: int
    has_prior: bool = True
    has_imu: bool = True
    has_points: bool = True
    has_lines: bool = True
    has_vps: bool = True
    has_relo: bool = True

    def segments(self):
        """(name, n_rows) in stack order."""
        segs = []
        if self.has_prior:
            segs.append(("prior", self.nd))
        if self.has_imu:
            segs.append(("imu", (self.nf - 1) * 15))
        if self.has_points:
            segs.append(("points", self.P * self.nf * 2))
        if self.has_lines:
            segs.append(("lines", self.L * self.nf * 2))
        if self.has_vps:
            segs.append(("vps", self.L * self.nf * 2))
        if self.has_relo:
            segs.append(("relo", self.P * 2))
        return segs

    def slices(self):
        out = {}
        o = 0
        for name, n in self.segments():
            out[name] = slice(o, o + n)
            o += n
        out["_total"] = o
        return out


def _structured_linearize(residual_fn, retract_fn, x, layout: WindowLayout):
    """(r0, J_d [R, nd], col_p [R], cols_l [R, 4]) via nd + 5 jvps."""
    nd, P, L = layout.nd, layout.P, layout.L
    N = nd + P + 4 * L
    dtype = jax.tree_util.tree_leaves(x)[0].dtype
    r0 = residual_fn(retract_fn(x, jnp.zeros(N, dtype)))

    def f(d):
        return residual_fn(retract_fn(x, d))

    zero = jnp.zeros(N, dtype)

    def jvp_of(t):
        return jax.jvp(f, (zero,), (t,))[1]

    # ONE batched jvp over all nd+5 tangents (three separate vmapped jvp
    # calls traced the residual graph three times and tripled XLA compile
    # time — measured minutes-long compiles of the lines program):
    # [0:nd]   dense unit tangents,
    # [nd]     ones over every scalar-landmark dim (rows are disjoint in
    #          their landmark dependence, so one jvp recovers all columns),
    # [nd+1:]  ones over orth component k of every line, k = 0..3.
    T = jnp.zeros((nd + 5, N), dtype)
    T = T.at[:nd, :nd].set(jnp.eye(nd, dtype=dtype))
    T = T.at[nd, nd : nd + P].set(1.0)
    for k in range(4):
        T = T.at[nd + 1 + k, nd + P + k :: 4].set(1.0)
    outs = jax.vmap(jvp_of)(T)  # [nd+5, R]
    J_d = outs[:nd].T  # [R, nd]
    col_p = outs[nd]
    cols_l = outs[nd + 1 :].T  # [R, 4]
    return r0, J_d, col_p, cols_l


def _assemble_blocks(r0, J_d, col_p, cols_l, layout: WindowLayout):
    """Block normal equations from the structured linearization."""
    nd, nf, P, L = layout.nd, layout.nf, layout.P, layout.L
    sl = layout.slices()
    dtype = r0.dtype

    H_dd = J_d.T @ J_d
    g_d = -(J_d.T @ r0)

    # --- scalar landmarks (points + relo rows share the slot's depth) ------
    segs_p = []
    if layout.has_points:
        segs_p.append("points")
    if layout.has_relo:
        segs_p.append("relo")
    if P and segs_p:
        cp = jnp.concatenate(
            [col_p[sl[s]].reshape(P, -1) for s in segs_p], axis=1
        )  # [P, rows/slot]
        Jp_d = jnp.concatenate(
            [J_d[sl[s]].reshape(P, -1, nd) for s in segs_p], axis=1
        )  # [P, rows/slot, nd]
        rp = jnp.concatenate(
            [r0[sl[s]].reshape(P, -1) for s in segs_p], axis=1
        )
        h_p = jnp.sum(cp * cp, axis=1)  # [P]
        H_dp = jnp.einsum("prd,pr->dp", Jp_d, cp)  # [nd, P]
        g_p = -jnp.sum(cp * rp, axis=1)
    else:
        h_p = jnp.zeros((P,), dtype)
        H_dp = jnp.zeros((nd, P), dtype)
        g_p = jnp.zeros((P,), dtype)

    # --- 4-dof line landmarks (line + vp rows) -----------------------------
    segs_l = []
    if layout.has_lines:
        segs_l.append("lines")
    if layout.has_vps:
        segs_l.append("vps")
    if L and segs_l:
        cl = jnp.concatenate(
            [cols_l[sl[s]].reshape(L, -1, 4) for s in segs_l], axis=1
        )  # [L, rows/slot, 4]
        Jl_d = jnp.concatenate(
            [J_d[sl[s]].reshape(L, -1, nd) for s in segs_l], axis=1
        )
        rl = jnp.concatenate(
            [r0[sl[s]].reshape(L, -1) for s in segs_l], axis=1
        )
        Hll_b = jnp.einsum("lrk,lrm->lkm", cl, cl)  # [L, 4, 4]
        H_dl = jnp.einsum("lrd,lrk->dlk", Jl_d, cl)  # [nd, L, 4]
        g_l = -jnp.einsum("lrk,lr->lk", cl, rl)  # [L, 4]
    else:
        Hll_b = jnp.zeros((L, 4, 4), dtype)
        H_dl = jnp.zeros((nd, L, 4), dtype)
        g_l = jnp.zeros((L, 4), dtype)
    return H_dd, g_d, H_dp, h_p, g_p, H_dl, Hll_b, g_l


def schur_solve_blocks(H_dd, g_d, H_dp, h_p, g_p, H_dl, Hll_b, g_l, lam,
                       diag_floor=1e-8):
    """Damped, Jacobi-preconditioned Schur solve on BLOCK normal equations —
    the same math as ``schur_solve`` (bit-comparable modulo FP reassociation)
    without ever forming the N×N Hessian."""
    out_dtype = H_dd.dtype
    sd = _solve_dtype(H_dd.dtype)
    H_dd, g_d = H_dd.astype(sd), g_d.astype(sd)
    H_dp, h_p, g_p = H_dp.astype(sd), h_p.astype(sd), g_p.astype(sd)
    H_dl, Hll_b, g_l = H_dl.astype(sd), Hll_b.astype(sd), g_l.astype(sd)
    lam = jnp.asarray(lam, sd)
    floor = jnp.asarray(diag_floor, sd)
    D = H_dd.shape[0]
    P = h_p.shape[0]
    L = Hll_b.shape[0]

    # Jacobi scales per column group
    d_dd = jnp.diag(H_dd)
    c_d = jnp.where(d_dd > 1e-30, jnp.sqrt(jnp.maximum(d_dd, 1e-30)), 1.0)
    c_p = jnp.where(h_p > 1e-30, jnp.sqrt(jnp.maximum(h_p, 1e-30)), 1.0)
    d_ll = jnp.diagonal(Hll_b, axis1=1, axis2=2)  # [L, 4]
    c_l = jnp.where(d_ll > 1e-30, jnp.sqrt(jnp.maximum(d_ll, 1e-30)), 1.0)

    H_dd = H_dd / (c_d[:, None] * c_d[None, :])
    g_d = g_d / c_d
    # damped scaled diagonals (scaled diag is 1 where nonzero else 0)
    s_dd = d_dd / (c_d * c_d)
    Hdd_d = H_dd + jnp.diag(lam * s_dd + floor)

    S = Hdd_d
    rhs = g_d
    wp = None
    Wl = None
    Hdp = None
    Hdl = None
    gp_s = None
    gl_s = None
    if P:
        Hdp = H_dp / (c_d[:, None] * c_p[None, :])
        s_p = h_p / (c_p * c_p)
        hp_d = s_p + lam * s_p + floor
        gp_s = g_p / c_p
        wp = 1.0 / hp_d
        S = S - (Hdp * wp[None, :]) @ Hdp.T
        rhs = rhs - Hdp @ (wp * gp_s)
    if L:
        Hdl = H_dl / (c_d[:, None, None] * c_l[None, :, :])
        Hll_s = Hll_b / (c_l[:, :, None] * c_l[:, None, :])
        s_l = d_ll / (c_l * c_l)
        Hll_d = Hll_s + jax.vmap(jnp.diag)(lam * s_l + floor)
        gl_s = g_l / c_l
        Wl = jnp.linalg.inv(Hll_d)
        S = S - jnp.einsum("dlk,lkm,elm->de", Hdl, Wl, Hdl)
        rhs = rhs - jnp.einsum("dlk,lkm,lm->d", Hdl, Wl, gl_s)

    cf = jax.scipy.linalg.cho_factor(S, lower=True)
    dd = jax.scipy.linalg.cho_solve(cf, rhs)

    parts = [dd / c_d]
    if P:
        dp = wp * (gp_s - Hdp.T @ dd)
        parts.append(dp / c_p)
    if L:
        dl = jnp.einsum("lkm,lm->lk", Wl, gl_s - jnp.einsum("dlk,d->lk", Hdl, dd))
        parts.append((dl / c_l).reshape(L * 4))
    return jnp.concatenate(parts).astype(out_dtype)


def lm_solve_window(
    residual_fn: Callable,
    retract_fn: Callable,
    x0,
    layout: WindowLayout,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """LM specialized to the window residual layout: same damping/accept
    semantics as ``lm_solve``, with the structured linearizer (nd + 5 jvps)
    and block Schur solve — cost grows LINEARLY with the landmark
    population instead of quadratically (see WindowLayout)."""
    dtype = residual_fn(x0).dtype

    def cost_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.dot(r, r)

    cost0 = cost_of(x0)

    def body(_, carry):
        x, lam, cost, gnorm = carry
        r0, J_d, col_p, cols_l = _structured_linearize(
            residual_fn, retract_fn, x, layout
        )
        blocks = _assemble_blocks(r0, J_d, col_p, cols_l, layout)
        delta = schur_solve_blocks(*blocks, lam, config.diag_floor)
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
        g_norm = jnp.linalg.norm(blocks[1])
        return x, lam, cost, g_norm

    lam0 = jnp.asarray(config.lambda_init, dtype)
    x, lam, cost, gnorm = jax.lax.fori_loop(
        0, config.num_iters, body, (x0, lam0, cost0, jnp.asarray(0.0, dtype))
    )
    return LMResult(x=x, cost0=cost0, cost=cost, lam=lam, grad_norm=gnorm)


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
