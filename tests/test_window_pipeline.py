"""Stepwise window pipeline checks: BA convergence, marginalization+slide
consistency — isolates the estimator stages on a perfect synthetic window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.estimator import window as win_mod
from vplines_slam_tpu.estimator.slide import (
    marginalize_old,
    slide_window_old,
    slide_window_new,
)
from vplines_slam_tpu.utils import demo

CFG = win_mod.WindowConfig(max_points=48, max_lines=4, max_imu=16)


@pytest.fixture(scope="module")
def problem():
    state, data, params = demo.synthetic_window(
        CFG, n_landmarks=150, imu_per_interval=16
    )
    return state, data, params


def perturb(state, scale=0.03, seed=3):
    rng = np.random.default_rng(seed)
    dp = jnp.asarray(rng.standard_normal(state.p.shape) * scale).at[0].set(0.0)
    dv = jnp.asarray(rng.standard_normal(state.v.shape) * scale)
    return state._replace(p=state.p + dp, v=state.v + dv)


def test_residuals_zero_at_truth(problem):
    state, data, params = problem
    r = win_mod.window_residuals(
        (state, data.pt_inv_depth, data.ln_orth), data, CFG, params
    )
    assert bool(jnp.all(jnp.isfinite(r)))
    # point+imu residuals tiny at ground truth (discretization only)
    assert float(jnp.max(jnp.abs(r))) < 0.2, float(jnp.max(jnp.abs(r)))


def test_solve_window_converges(problem):
    state, data, params = problem
    state_p = perturb(state)
    state_f, data_f, out = win_mod.solve_window(state_p, data, CFG, params)
    err0 = float(jnp.linalg.norm(state_p.p - state.p))
    err1 = float(jnp.linalg.norm(state_f.p - state.p))
    assert err1 < err0 * 0.05, (err0, err1)
    assert float(out.cost) < float(out.cost0) * 1e-3


def test_marginalize_and_slide_keeps_truth(problem):
    """After marg+slide at truth, the shifted window must still have ~zero
    residuals (including the new prior at its linearization point)."""
    state, data, params = problem
    prior = marginalize_old(state, data, CFG, params)
    assert bool(prior.valid)
    state_s, data_s = slide_window_old(state, data, CFG, params, prior)
    r = win_mod.window_residuals(
        (state_s, data_s.pt_inv_depth, data_s.ln_orth), data_s, CFG, params
    )
    assert bool(jnp.all(jnp.isfinite(r)))
    assert float(jnp.max(jnp.abs(r))) < 0.25, float(jnp.max(jnp.abs(r)))


def test_prior_pulls_back_after_slide(problem):
    """Perturb the slid window and re-solve: the prior + remaining factors
    must pull the states back to (shifted) truth."""
    state, data, params = problem
    prior = marginalize_old(state, data, CFG, params)
    state_s, data_s = slide_window_old(state, data, CFG, params, prior)

    state_p = perturb(state_s, scale=0.02, seed=11)
    state_f, data_f, out = win_mod.solve_window(state_p, data_s, CFG, params)
    # slot NF-1 is an unconstrained placeholder after the slide (overwritten
    # by the next frame insert) — compare the constrained frames only
    err0 = float(jnp.linalg.norm(state_p.p[:-1] - state_s.p[:-1]))
    err1 = float(jnp.linalg.norm(state_f.p[:-1] - state_s.p[:-1]))
    assert err1 < err0 * 0.05, (err0, err1)
    assert float(out.cost) < 1e-3


def test_second_new_slide_consistency(problem):
    """Dropping the second-newest frame must keep residuals ~zero at truth."""
    state, data, params = problem
    state_s, data_s = slide_window_new(state, data, CFG, params)
    r = win_mod.window_residuals(
        (state_s, data_s.pt_inv_depth, data_s.ln_orth), data_s, CFG, params
    )
    assert bool(jnp.all(jnp.isfinite(r)))
    assert float(jnp.max(jnp.abs(r))) < 0.3, float(jnp.max(jnp.abs(r)))


def test_repeated_slide_stable(problem):
    """Five marg+slide cycles at truth: residuals stay bounded (no prior
    corruption accumulating)."""
    state, data, params = problem
    for _ in range(5):
        prior = marginalize_old(state, data, CFG, params)
        state, data = slide_window_old(state, data, CFG, params, prior)
        r = win_mod.window_residuals(
            (state, data.pt_inv_depth, data.ln_orth), data, CFG, params
        )
        assert float(jnp.max(jnp.abs(r))) < 0.5, float(jnp.max(jnp.abs(r)))
