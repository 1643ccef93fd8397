"""Distributed BA on the virtual 8-device CPU mesh (sharding correctness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.estimator import window as win_mod
from vplines_slam_tpu.estimator.slide import ingest_frame, set_imu_interval
from vplines_slam_tpu.models import imu as imu_mod
from vplines_slam_tpu.parallel import dist_ba
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn
from jax.sharding import Mesh


CFG = win_mod.WindowConfig(max_points=64, max_lines=8, max_imu=16)


def build_problem(perturb=0.02, seed=0):
    """A filled window with exact synthetic observations + IMU, then a
    perturbed state that BA must pull back toward truth."""
    traj = syn.figure8_trajectory()
    X = syn.scatter_landmarks(200, seed=seed, box=((-4, 4), (-4, 4), (-1, 3)))
    params = imu_mod.default_params()
    R_BC = jnp.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    q_ic = geo.rot_to_quat(R_BC)
    p_ic = jnp.zeros(3)

    state = win_mod.empty_state(CFG)._replace(q_ic=q_ic, p_ic=p_ic)
    data = win_mod.empty_tracks(CFG)
    nf = CFG.nf
    times = [0.35 * k for k in range(nf)]
    for k, t in enumerate(times):
        q_wb, p_wb = traj.quat(t), traj.pos(t)
        state = state._replace(
            p=state.p.at[k].set(p_wb), q=state.q.at[k].set(q_wb),
            v=state.v.at[k].set(syn.world_velocity(traj, t)),
        )
        q_cw, p_cw = geo.pose_inverse(*geo.pose_compose(q_wb, p_wb, q_ic, p_ic))
        Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, x))(X)
        uv = Xc[:, :2] / Xc[:, 2:3]
        vis = np.asarray((Xc[:, 2] > 0.5) & (jnp.abs(uv[:, 0]) < 0.8) & (jnp.abs(uv[:, 1]) < 0.55))
        sel = np.flatnonzero(vis)[: CFG.max_points - 4]
        ids = np.full(CFG.max_points, -1, np.int32)
        rays = np.zeros((CFG.max_points, 3))
        rays[:, 2] = 1.0
        ids[: len(sel)] = sel
        rays[: len(sel), :2] = np.asarray(uv)[sel]
        data = ingest_frame(data, CFG, k, jnp.asarray(ids), jnp.asarray(rays))
        if k > 0:
            n = 16
            ts = jnp.linspace(times[k - 1], t, n + 1)
            accs, gyrs = syn.imu_samples(traj, ts)
            data = set_imu_interval(
                data, k - 1, jnp.diff(ts), accs, gyrs, jnp.ones(n), params=params
            )
    data = win_mod.triangulate_points(state, data, CFG)

    # perturb all but frame 0
    rng = np.random.default_rng(seed + 7)
    dp = jnp.asarray(rng.standard_normal((nf, 3)) * perturb).at[0].set(0.0)
    state_pert = state._replace(p=state.p + dp)
    data = data._replace(
        pt_inv_depth=data.pt_inv_depth * (1 + 0.05 * jnp.asarray(rng.standard_normal(CFG.max_points)))
    )
    return state, state_pert, data, params


@pytest.mark.slow
def test_dist_ba_matches_truth_and_single_device():
    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("f",))
    state_true, state0, data, params = build_problem()

    step = dist_ba.make_dist_ba_step(mesh, CFG, params, num_iters=4)
    data_sh = dist_ba.shard_tracks(data, mesh)
    state1, invd1, cost = step(state0, data_sh)
    assert float(cost) < 1e-3

    # pulled back toward truth modulo the free global-translation gauge
    # (no prior in this standalone problem)
    def gauge_err(p):
        d = p - state_true.p
        return float(jnp.linalg.norm(d - jnp.mean(d, axis=0)))

    err0 = gauge_err(state0.p)
    err1 = gauge_err(state1.p)
    assert err1 < err0 * 0.1, (err0, err1)

    # single-device reference: same step on a 1-device mesh
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("f",))
    step1 = dist_ba.make_dist_ba_step(mesh1, CFG, params, num_iters=4)
    state1r, invd1r, cost_r = step1(state0, dist_ba.shard_tracks(data, mesh1))
    np.testing.assert_allclose(np.asarray(state1.p), np.asarray(state1r.p), atol=1e-8)
    np.testing.assert_allclose(np.asarray(invd1), np.asarray(invd1r), atol=1e-8)
    np.testing.assert_allclose(float(cost), float(cost_r), rtol=1e-8)
