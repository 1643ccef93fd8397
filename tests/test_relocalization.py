"""Fast-relocalization factors in the sliding-window BA.

Reference semantics: estimator.cpp:1174-1206 adds projection factors between
each matched feature's anchor frame and a 6-dof relo pose seeded at the old
keyframe's pose; after the solve the refined relative pose feeds the pose
graph (setReloFrame:1848, pubRelocalization).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.estimator import window as win_mod
from vplines_slam_tpu.utils import demo
from vplines_slam_tpu.utils.geometry import (
    quat_conj,
    quat_mul,
    quat_rotate,
    so3_exp_quat,
)

CFG = win_mod.WindowConfig(max_points=48, max_lines=4, max_imu=16)


def _armed_window():
    state, data, params = demo.synthetic_window(CFG, n_landmarks=150)
    # the "old keyframe" IS frame 0 here: its observations become the loop
    # matches, so the relo pose must converge to frame 0's pose
    relo_mask = data.pt_mask[:, 0] & data.pt_solved & (data.pt_id >= 0)
    data = data._replace(
        relo_obs=data.pt_obs[:, 0],
        relo_mask=relo_mask,
        relo_valid=jnp.asarray(True),
    )
    return state, data, params


@pytest.mark.slow
def test_relo_pose_converges_to_truth():
    state, data, params = _armed_window()
    p_true, q_true = state.p[0], state.q[0]
    # seed the relo pose with a drifted guess (the loop's accumulated drift)
    state = state._replace(
        p_relo=p_true + jnp.asarray([0.3, -0.2, 0.15]),
        q_relo=quat_mul(q_true, so3_exp_quat(jnp.asarray([0.02, -0.03, 0.05]))),
    )
    state2, data2, out = win_mod.solve_window(state, data, CFG, params, num_iters=10)
    assert float(out.cost) < float(out.cost0)
    # relo pose pulled onto the true old-keyframe pose by the match factors
    assert np.linalg.norm(np.asarray(state2.p_relo - p_true)) < 0.02
    dq = quat_mul(quat_conj(q_true), state2.q_relo)
    assert abs(float(dq[0])) > np.cos(np.deg2rad(0.5) / 2)
    # window states unchanged at truth (gauge held)
    assert np.linalg.norm(np.asarray(state2.p - state.p)) < 0.05


def test_relo_masked_out_when_invalid():
    state, data, params = demo.synthetic_window(CFG, n_landmarks=150)
    # garbage relo obs but relo_valid=False: must not perturb the solve
    data_off = data._replace(
        relo_obs=jnp.full_like(data.relo_obs, 3.0),
        relo_mask=jnp.ones_like(data.relo_mask),
        relo_valid=jnp.asarray(False),
    )
    r = win_mod.window_residuals(
        (state, data.pt_inv_depth, data.ln_orth), data_off, CFG, params
    )
    r_ref = win_mod.window_residuals(
        (state, data.pt_inv_depth, data.ln_orth), data, CFG, params
    )
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-12)


@pytest.mark.slow
def test_relative_pose_from_solution():
    state, data, params = _armed_window()
    state = state._replace(p_relo=state.p[0] + 0.1, q_relo=state.q[0])
    state2, _, _ = win_mod.solve_window(state, data, CFG, params, num_iters=8)
    kf = CFG.nf - 2
    rel_t = quat_rotate(quat_conj(state2.q_relo), state2.p[kf] - state2.p_relo)
    # ground truth relative (frame kf in frame 0)
    rel_t_true = quat_rotate(quat_conj(state.q[0]), state.p[kf] - state.p[0])
    assert np.linalg.norm(np.asarray(rel_t - rel_t_true)) < 0.03
