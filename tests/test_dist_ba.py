"""Distributed BA on the virtual 8-device CPU mesh (sharding correctness).

Validates the VERDICT round-1 north star: the N-device landmark-sharded LM
solve (points + lines + VP factors) is the SAME algorithm as the single-chip
``solve_window`` — identical damping/accept logic — so results must agree
across mesh sizes and with the single-chip path to FP-reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vplines_slam_tpu.estimator import window as win_mod
from vplines_slam_tpu.models import imu as imu_mod
from vplines_slam_tpu.parallel import dist_ba
from vplines_slam_tpu.utils import demo

CFG = win_mod.WindowConfig(max_points=32, max_lines=8, max_imu=12)


def build_problem(perturb=0.02):
    state, data, params = demo.synthetic_window(
        CFG, n_landmarks=100, imu_per_interval=12, seed=0, n_lines=16,
    )
    nf = CFG.nf
    rng = np.random.default_rng(7)
    dp = jnp.asarray(rng.standard_normal((nf, 3)) * perturb).at[0].set(0.0)
    state_pert = state._replace(p=state.p + dp)
    data = data._replace(
        pt_inv_depth=data.pt_inv_depth
        * (1 + 0.05 * jnp.asarray(rng.standard_normal(CFG.max_points)))
    )
    return state, state_pert, data, params


def test_dist_ba_matches_truth_and_single_device():
    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("f",))
    state_true, state0, data, params = build_problem()
    assert bool(jnp.any(data.ln_solved)), "problem must include solved lines"
    assert bool(jnp.any(data.ln_vp_mask)), "problem must include VP observations"

    step = dist_ba.make_dist_ba_step(mesh, CFG, params, num_iters=4)
    data_sh = dist_ba.shard_tracks(data, mesh)
    state1, data1, out = step(state0, data_sh)
    assert float(out.cost) < float(out.cost0)

    # pulled back toward truth modulo the free global-translation gauge
    # (no prior in this standalone problem)
    def gauge_err(p):
        d = p - state_true.p
        return float(jnp.linalg.norm(d - jnp.mean(d, axis=0)))

    err0 = gauge_err(state0.p)
    err1 = gauge_err(state1.p)
    assert err1 < err0 * 0.1, (err0, err1)

    # single-device mesh: identical result
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("f",))
    step1 = dist_ba.make_dist_ba_step(mesh1, CFG, params, num_iters=4)
    state1r, data1r, out_r = step1(state0, dist_ba.shard_tracks(data, mesh1))
    np.testing.assert_allclose(
        np.asarray(state1.p), np.asarray(state1r.p), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(data1.pt_inv_depth), np.asarray(data1r.pt_inv_depth), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(data1.ln_orth), np.asarray(data1r.ln_orth), atol=1e-7
    )
    np.testing.assert_allclose(float(out.cost), float(out_r.cost), rtol=1e-7)

    # single-chip solve_window: same algorithm, same answer
    state_sc, data_sc, out_sc = jax.jit(
        lambda s, d: win_mod.solve_window(s, d, CFG, params, num_iters=4)
    )(state0, data)
    np.testing.assert_allclose(
        np.asarray(state1.p), np.asarray(state_sc.p), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(data1.pt_inv_depth),
        np.asarray(data_sc.pt_inv_depth),
        atol=1e-6,
    )
    np.testing.assert_allclose(float(out.cost), float(out_sc.cost), rtol=1e-6)


def test_vio_engine_with_mesh_matches_single_chip():
    """r5: the distributed solver is product-reachable — VioEngine(mesh=...)
    runs its track_step through dist_ba and must match the meshless engine
    bit-for-tolerance on the same frame stream (the SlamSystem/run_euroc
    mapping_multichip path)."""
    import numpy as np
    from jax.sharding import Mesh

    from vplines_slam_tpu.estimator.vio import VioEngine, track_step
    from vplines_slam_tpu.estimator.window import WindowConfig
    from vplines_slam_tpu.models import imu as imu_mod
    from vplines_slam_tpu.utils import demo

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("f",))
    cfg = WindowConfig(max_points=32, max_lines=8, max_imu=8, window=4,
                       line_min_obs=3)
    state, data, params = demo.synthetic_window(
        cfg, n_landmarks=80, imu_per_interval=8, perturb=0.01, n_lines=10,
    )
    eng_sc = VioEngine(cfg, params)
    eng_mc = VioEngine(cfg, params, mesh=mesh)

    ids = jnp.full((cfg.max_points,), -1, jnp.int32)
    rays = jnp.zeros((cfg.max_points, 3)).at[:, 2].set(1.0)
    imu_batch = (
        jnp.zeros((cfg.max_imu,)), jnp.zeros((cfg.max_imu + 1, 3)),
        jnp.zeros((cfg.max_imu + 1, 3)), jnp.zeros((cfg.max_imu,), bool),
        jnp.asarray(False),
    )
    s_sc, d_sc, out_sc = eng_sc._track_step(state, data, ids, rays, (), imu_batch)
    s_mc, d_mc, out_mc = eng_mc._track_step(state, data, ids, rays, (), imu_batch)
    np.testing.assert_allclose(np.asarray(s_mc.p), np.asarray(s_sc.p), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(d_mc.pt_inv_depth), np.asarray(d_sc.pt_inv_depth), atol=5e-5
    )
    np.testing.assert_allclose(
        float(out_mc.ba_cost), float(out_sc.ba_cost), rtol=1e-5
    )
