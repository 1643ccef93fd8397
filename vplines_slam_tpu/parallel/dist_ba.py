"""Distributed sliding-window BA: landmark blocks sharded over a device mesh.

The multi-chip scaling design from BASELINE.json's north star: partition the
landmark population (point depths) across devices, evaluate residual
jacobians locally, Schur-reduce landmark blocks locally, and all-reduce the
small camera-camera reduced system over ICI with ``jax.lax.psum`` — the
factor-graph analogue of data-parallel gradient sync.  The reference has no
distributed mode at all (single machine, ROS loopback — SURVEY §2.8); this
is new capability, not parity.

Layout:
  mesh axis "f": features (points).  Window states are replicated.
  Each device holds MAXP/n point tracks; IMU + prior factors are evaluated
  redundantly on every device (tiny) so no second communication round is
  needed before the reduced solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..estimator import window as win_mod
from ..models import imu as imu_mod
from ..solver import lm as lm_mod


def shard_tracks(data: win_mod.TrackData, mesh: Mesh):
    """Place point-track arrays sharded over the 'f' axis, everything else
    replicated."""
    pt_sharded = {
        "pt_id", "pt_obs", "pt_mask", "pt_start", "pt_inv_depth", "pt_solved",
    }
    out = {}
    for name, val in data._asdict().items():
        if name in pt_sharded:
            spec = P("f", *([None] * (val.ndim - 1)))
        else:
            spec = P(*([None] * getattr(val, "ndim", 0))) if hasattr(val, "ndim") else None
        if hasattr(val, "ndim"):
            out[name] = jax.device_put(val, NamedSharding(mesh, spec))
        else:
            out[name] = val
    return win_mod.TrackData(**out)


def make_dist_ba_step(mesh: Mesh, cfg: win_mod.WindowConfig, params: imu_mod.ImuParams,
                      num_iters: int = 2):
    """Build a jitted distributed Gauss-Newton step.

    Returns step(state, data) -> (state', inv_depth', cost).  Landmark blocks
    (depths) live and are eliminated on their home device; the ND x ND reduced
    camera system is psum'ed over ICI and solved replicated.
    """
    nd = cfg.nd
    n_local = cfg.max_points // mesh.shape["f"]

    def local_point_system(state, pt_obs, pt_mask, pt_start, pt_id, pt_solved,
                           inv_depth):
        """Per-shard: point-factor jacobians wrt (dense, local depths)."""
        nf = cfg.nf
        dtype = state.p.dtype

        def residual(dense_delta, invd):
            st = win_mod.retract_state(state, dense_delta, cfg)
            from ..factors import residuals as res

            def one_rs(slot, j):
                i = pt_start[slot]
                r = res.point_reprojection(
                    st.p[i], st.q[i], st.p[j], st.q[j], st.p_ic, st.q_ic,
                    invd[slot], pt_obs[slot, i], pt_obs[slot, j],
                )
                valid = (
                    (pt_id[slot] >= 0) & pt_mask[slot, j] & pt_solved[slot] & (j != i)
                )
                w = res.huber_weight(
                    jax.lax.stop_gradient(jnp.sum(r * r)) * cfg.point_sqrt_info**2,
                    cfg.huber_delta,
                )
                return r * cfg.point_sqrt_info * w * valid.astype(dtype)

            r = jax.vmap(
                lambda s: jax.vmap(lambda j: one_rs(s, j))(jnp.arange(nf))
            )(jnp.arange(n_local))
            return r.reshape(-1)

        zero_d = jnp.zeros(nd, state.p.dtype)
        r0 = residual(zero_d, inv_depth)
        Jd = jax.jacfwd(lambda d: residual(d, inv_depth))(zero_d)  # [R, nd]
        Jl = jax.jacfwd(lambda l: residual(zero_d, l))(inv_depth)  # [R, n_local]
        return r0, Jd, Jl

    def dense_system(state, data):
        """IMU + prior residuals (replicated, tiny)."""
        def residual(dense_delta):
            st = win_mod.retract_state(state, dense_delta, cfg)
            from ..solver import marginalization as marg_mod

            dx = win_mod.boxminus_state(st, data.prior_state, cfg)
            r_p = marg_mod.prior_residual(data.prior, dx)
            r_i = win_mod._imu_residuals(st, data, cfg, params).reshape(-1)
            return jnp.concatenate([r_p, r_i])

        zero_d = jnp.zeros(nd, state.p.dtype)
        r0 = residual(zero_d)
        J = jax.jacfwd(residual)(zero_d)
        return r0, J

    def gn_step(state, data):
        def sharded_fn(pt_obs, pt_mask, pt_start, pt_id, pt_solved, inv_depth):
            r0, Jd, Jl = local_point_system(
                state, pt_obs, pt_mask, pt_start, pt_id, pt_solved, inv_depth
            )
            # local landmark elimination
            hl = jnp.sum(Jl * Jl, axis=0) + 1e-6  # [n_local] (diag; Jl is col-sparse)
            g_d_local = -(Jd.T @ r0)
            g_l = -(Jl.T @ r0)
            Hdl = Jd.T @ Jl  # [nd, n_local]
            wl = 1.0 / hl
            S_partial = Jd.T @ Jd - (Hdl * wl[None, :]) @ Hdl.T
            rhs_partial = g_d_local - Hdl @ (wl * g_l)
            cost_partial = 0.5 * jnp.dot(r0, r0)
            # ICI all-reduce of the reduced camera system
            S = jax.lax.psum(S_partial, "f")
            rhs = jax.lax.psum(rhs_partial, "f")
            cost = jax.lax.psum(cost_partial, "f")

            # replicated dense part
            r_dense, J_dense = dense_system(state, data)
            S = S + J_dense.T @ J_dense
            rhs = rhs - J_dense.T @ r_dense
            cost = cost + 0.5 * jnp.dot(r_dense, r_dense)

            S = S + jnp.diag(1e-6 * jnp.diag(S) + 1e-9)
            dd = jnp.linalg.solve(S, rhs)
            # local landmark back-substitution
            dl = wl * (g_l - Hdl.T @ dd)
            return dd, dl, cost

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        dd, dl, cost = shard_map(
            sharded_fn,
            mesh=mesh,
            in_specs=(P("f"), P("f"), P("f"), P("f"), P("f"), P("f")),
            out_specs=(P(), P("f"), P()),
            check_rep=False,
        )(
            data.pt_obs, data.pt_mask, data.pt_start, data.pt_id,
            data.pt_solved, data.pt_inv_depth,
        )
        state_new = win_mod.retract_state(state, dd, cfg)
        invd_new = data.pt_inv_depth + dl
        return state_new, invd_new, cost

    def step(state, data):
        def body(_, carry):
            st, invd = carry
            st2, invd2, cost = gn_step(st, data._replace(pt_inv_depth=invd))
            return st2, invd2

        st, invd = jax.lax.fori_loop(
            0, num_iters, body, (state, data.pt_inv_depth)
        )
        _, _, cost = gn_step(st, data._replace(pt_inv_depth=invd))
        return st, invd, cost

    return jax.jit(step)
