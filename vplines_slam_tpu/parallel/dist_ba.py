"""Distributed sliding-window BA: landmark blocks sharded over a device mesh.

The multi-chip scaling design from BASELINE.json's north star: partition the
landmark population (point inverse depths AND 4-dof lines) across devices,
evaluate residual jacobians locally, Schur-eliminate landmark blocks locally,
and all-reduce the small dense (camera) reduced system over ICI with
``jax.lax.psum`` — the factor-graph analogue of data-parallel gradient sync.
The reference has no distributed mode at all (single machine, ROS loopback —
SURVEY §2.8); this is new capability, not parity.

The distributed solver is the SAME algorithm as the single-chip one
(solver/lm.py lm_solve + schur_solve): identical Levenberg-Marquardt damping,
branchless accept/reject, identical Schur elimination, identical residual
stack (window.window_residuals) — so an N-device solve matches a 1-device
solve to floating-point reduction order.  This is achieved by reusing
``window_residuals`` per shard with a "local" WindowConfig whose landmark
capacities are the per-device shard sizes.

Layout:
  mesh axis "f": landmarks.  Point tracks and line tracks are sharded along
  their slot axis; window states, IMU intervals and the prior are replicated.
  Each landmark's residual rows live entirely on its home device (a track's
  observations are all in its slot row), so landmark Hessian columns never
  cross devices; only the nd x nd reduced camera system is psum'ed.

Multi-host note: the same psum rides ICI within a host and DCN across hosts
when the Mesh spans multiple processes (jax.distributed); nothing here is
host-count-aware by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..estimator import window as win_mod
from ..models import imu as imu_mod
from ..solver import lm as lm_mod

try:  # jax >= 0.5 exposes shard_map at top level (check_rep -> check_vma)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


# arrays of TrackData sharded along their first (landmark-slot) axis
_PT_SHARDED = (
    "pt_id", "pt_obs", "pt_mask", "pt_start", "pt_inv_depth", "pt_solved",
    "relo_obs", "relo_mask",
)
_LN_SHARDED = (
    "ln_id", "ln_obs", "ln_mask", "ln_vp", "ln_vp_mask", "ln_orth", "ln_solved",
)


def shard_tracks(data: win_mod.TrackData, mesh: Mesh) -> win_mod.TrackData:
    """Place landmark-track arrays sharded over the 'f' axis, everything else
    (IMU intervals, prior, relo scalars) replicated."""
    sharded = set(_PT_SHARDED) | set(_LN_SHARDED)
    out = {}
    for name, val in data._asdict().items():
        if not hasattr(val, "ndim"):
            # nested pytrees (imu_pre, prior, prior_state): replicate leaves
            out[name] = jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    a, NamedSharding(mesh, P(*([None] * a.ndim)))
                ),
                val,
            )
            continue
        if name in sharded:
            spec = P("f", *([None] * (val.ndim - 1)))
        else:
            spec = P(*([None] * val.ndim))
        out[name] = jax.device_put(val, NamedSharding(mesh, spec))
    return win_mod.TrackData(**out)


def _local_cfg(cfg: win_mod.WindowConfig, n_shards: int) -> win_mod.WindowConfig:
    if cfg.max_points % n_shards or cfg.max_lines % n_shards:
        raise ValueError(
            f"max_points={cfg.max_points} and max_lines={cfg.max_lines} must "
            f"divide evenly over {n_shards} devices"
        )
    return cfg._replace(
        max_points=cfg.max_points // n_shards,
        max_lines=cfg.max_lines // n_shards,
    )


def make_dist_ba_step(
    mesh: Mesh,
    cfg: win_mod.WindowConfig,
    params: imu_mod.ImuParams,
    num_iters: int | None = None,
    lm_cfg: lm_mod.LMConfig | None = None,
    weights: win_mod.ResidualWeights = win_mod.ResidualWeights(),
):
    """Build the jitted distributed LM solve.

    Returns step(state, data) -> (state', data', LMResult-like namedtuple)
    with the same semantics (including the yaw/position gauge re-anchoring of
    double2vector2:810-900) as ``window.solve_window``.
    """
    n_shards = mesh.shape["f"]
    cfg_loc = _local_cfg(cfg, n_shards)
    lm_cfg = lm_cfg or lm_mod.LMConfig(num_iters=num_iters or cfg.ba_iters)
    nd = cfg.nd
    n_loc = cfg_loc.max_points + 4 * cfg_loc.max_lines  # local landmark dims

    w_local = weights._replace(use_imu=False, use_prior=False)
    w_dense = weights._replace(
        use_points=False, use_lines=False, use_vps=False, use_relo=False
    )

    layout_loc = lm_mod.WindowLayout(
        nd=nd, nf=cfg_loc.nf, P=cfg_loc.max_points, L=cfg_loc.max_lines,
        has_prior=False, has_imu=False,
        has_points=w_local.use_points, has_lines=w_local.use_lines,
        has_vps=w_local.use_vps, has_relo=w_local.use_relo,
    )

    def lm_body(state, data_loc):
        """Runs per device inside shard_map.  data_loc's landmark arrays are
        the local shard; IMU/prior fields are the replicated full copies.

        r5: uses the STRUCTURED window linearizer per shard (nd+5 jvps +
        block normal equations, lm.lm_solve_window's machinery) — the shard's
        landmark population no longer appears in the jvp count, so mapping-
        scale shards cost the same linearization work as realtime ones."""
        dtype = state.p.dtype

        def local_residual(x):
            return win_mod.window_residuals(x, data_loc, cfg_loc, params, w_local)

        def dense_residual(st):
            x = (st, data_loc.pt_inv_depth, data_loc.ln_orth)
            return win_mod.window_residuals(x, data_loc, cfg_loc, params, w_dense)

        def retract(x, d):
            return win_mod.retract_all(x, d, cfg_loc)

        def cost_of(x):
            r_loc = local_residual(x)
            c_loc = jax.lax.psum(0.5 * jnp.dot(r_loc, r_loc), "f")
            r_d = dense_residual(x[0])
            return c_loc + 0.5 * jnp.dot(r_d, r_d)

        def solve_damped(blocks, rd0, Jd, lam):
            """schur_solve_blocks' math with the dense block psum'ed across
            shards (landmark blocks stay fully local)."""
            H_dd_loc, g_d_loc, H_dp, h_p, g_p, H_dl, Hll_b, g_l = blocks
            Hdd = jax.lax.psum(H_dd_loc, "f") + Jd.T @ Jd
            g_d = jax.lax.psum(g_d_loc, "f") - Jd.T @ rd0
            floor = jnp.asarray(lm_cfg.diag_floor, dtype)
            # Jacobi scales: dense from the GLOBAL (psum'ed) diagonal,
            # landmark scales local (their columns never cross devices)
            diag_d_raw = jnp.diag(Hdd)
            c_d = jnp.where(
                diag_d_raw > 1e-30, jnp.sqrt(jnp.maximum(diag_d_raw, 1e-30)), 1.0
            )
            Hdd = Hdd / (c_d[:, None] * c_d[None, :])
            g_d = g_d / c_d
            s_d = diag_d_raw / (c_d * c_d)
            Hdd = Hdd + jnp.diag(lam * s_d + floor)

            Pl = cfg_loc.max_points
            Ll = cfg_loc.max_lines
            S = Hdd
            rhs = g_d
            corr_S = jnp.zeros((nd, nd), dtype)
            corr_r = jnp.zeros((nd,), dtype)
            wp = None
            Wl = None
            if Pl > 0:
                c_p = jnp.where(
                    h_p > 1e-30, jnp.sqrt(jnp.maximum(h_p, 1e-30)), 1.0
                )
                Hdp = H_dp / (c_d[:, None] * c_p[None, :])
                s_p = h_p / (c_p * c_p)
                hp = s_p + lam * s_p + floor
                g_p_s = g_p / c_p
                wp = 1.0 / hp
                corr_S = corr_S + (Hdp * wp[None, :]) @ Hdp.T
                corr_r = corr_r + Hdp @ (wp * g_p_s)
            if Ll > 0:
                d_ll = jnp.diagonal(Hll_b, axis1=1, axis2=2)
                c_l4 = jnp.where(
                    d_ll > 1e-30, jnp.sqrt(jnp.maximum(d_ll, 1e-30)), 1.0
                )
                Hdl = H_dl / (c_d[:, None, None] * c_l4[None, :, :])
                Hll_s = Hll_b / (c_l4[:, :, None] * c_l4[:, None, :])
                s_l = d_ll / (c_l4 * c_l4)
                Hll_d = Hll_s + jax.vmap(jnp.diag)(lam * s_l + floor)
                g_l_s = g_l / c_l4
                Wl = jnp.linalg.inv(Hll_d)
                corr_S = corr_S + jnp.einsum("dlk,lkm,elm->de", Hdl, Wl, Hdl)
                corr_r = corr_r + jnp.einsum("dlk,lkm,lm->d", Hdl, Wl, g_l_s)
            S = S - jax.lax.psum(corr_S, "f")
            rhs = rhs - jax.lax.psum(corr_r, "f")

            cf = jax.scipy.linalg.cho_factor(S, lower=True)
            dd = jax.scipy.linalg.cho_solve(cf, rhs)

            parts = [dd / c_d]
            if Pl > 0:
                dp = wp * (g_p_s - Hdp.T @ dd)
                parts.append(dp / c_p)
            if Ll > 0:
                dl = jnp.einsum(
                    "lkm,lm->lk", Wl, g_l_s - jnp.einsum("dlk,d->lk", Hdl, dd)
                )
                parts.append((dl / c_l4).reshape(Ll * 4))
            return jnp.concatenate(parts)

        x0 = (state, data_loc.pt_inv_depth, data_loc.ln_orth)
        cost0 = cost_of(x0)

        def body(_, carry):
            x, lam, cost = carry
            r0, J_d, col_p, cols_l = lm_mod._structured_linearize(
                local_residual, retract, x, layout_loc
            )
            blocks = lm_mod._assemble_blocks(r0, J_d, col_p, cols_l, layout_loc)
            zd = jnp.zeros(nd, dtype)
            rd0 = dense_residual(x[0])
            Jd = jax.jacfwd(
                lambda d: dense_residual(win_mod.retract_state(x[0], d, cfg))
            )(zd)
            delta = solve_damped(blocks, rd0, Jd, lam)
            x_new = retract(x, delta)
            cost_new = cost_of(x_new)
            accept = cost_new < cost
            x = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), x, x_new
            )
            cost = jnp.where(accept, cost_new, cost)
            lam = jnp.clip(
                jnp.where(accept, lam * lm_cfg.lambda_down, lam * lm_cfg.lambda_up),
                lm_cfg.lambda_min,
                lm_cfg.lambda_max,
            )
            return x, lam, cost

        lam0 = jnp.asarray(lm_cfg.lambda_init, dtype)
        (x, lam, cost) = jax.lax.fori_loop(
            0, lm_cfg.num_iters, body, (x0, lam0, cost0)
        )
        state_new, invd_new, orth_new = x
        return state_new, invd_new, orth_new, cost0, cost, lam

    state_specs = jax.tree_util.tree_map(
        lambda _: P(), win_mod.empty_state(cfg)
    )
    data_specs = {}
    proto = win_mod.empty_tracks(cfg)
    for name, val in proto._asdict().items():
        if name in _PT_SHARDED or name in _LN_SHARDED:
            data_specs[name] = P("f", *([None] * (val.ndim - 1)))
        else:
            data_specs[name] = jax.tree_util.tree_map(
                lambda a: P(*([None] * a.ndim)), val
            )
    data_specs = win_mod.TrackData(**data_specs)

    sharded_lm = shard_map(
        lm_body,
        mesh=mesh,
        in_specs=(state_specs, data_specs),
        out_specs=(state_specs, P("f"), P("f", None), P(), P(), P()),
        check_vma=False,
    )

    def step(state, data):
        state_new, invd_new, orth_new, cost0, cost, lam = sharded_lm(state, data)
        # gauge fix (double2vector2:810-900), identical to solve_window
        state_fixed, orth_fixed = win_mod.gauge_fix(
            state, state_new, orth_new, data.ln_solved, cfg
        )
        data_new = data._replace(pt_inv_depth=invd_new, ln_orth=orth_fixed)
        out = lm_mod.LMResult(
            x=(state_fixed, invd_new, orth_fixed),
            cost0=cost0, cost=cost, lam=lam,
            grad_norm=jnp.asarray(0.0, cost.dtype),
        )
        return state_fixed, data_new, out

    return jax.jit(step)
