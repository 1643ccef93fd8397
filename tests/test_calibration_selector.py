import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import calibration as cal
from vplines_slam_tpu.models import selector as sel
from vplines_slam_tpu.utils import geometry as geo
from vplines_slam_tpu.utils import synthetic as syn


def test_extrinsic_rotation_hand_eye():
    rng = np.random.default_rng(1)
    q_ic_true = geo.so3_exp_quat(jnp.asarray([0.1, -0.2, 1.5]))
    K = 30
    q_cam, q_imu, valid = [], [], []
    for _ in range(K):
        w = rng.standard_normal(3) * 0.2
        qi = geo.so3_exp_quat(jnp.asarray(w))  # body relative rotation
        # camera relative rotation: q_c = q_ic^-1 q_i q_ic
        qc = geo.quat_mul(geo.quat_conj(q_ic_true), geo.quat_mul(qi, q_ic_true))
        q_cam.append(qc)
        q_imu.append(qi)
        valid.append(True)
    q_est, conv, s2 = cal.calibrate_extrinsic_rotation(
        jnp.stack(q_cam), jnp.stack(q_imu), jnp.asarray(valid)
    )
    assert bool(conv)
    qd = geo.quat_mul(geo.quat_conj(q_est), q_ic_true)
    assert abs(float(qd[0])) > 1 - 1e-8


def test_time_offset_calibration():
    """Camera yaw curve delayed by a known td must be recovered."""
    td_true = 0.035
    t_imu = jnp.linspace(0.0, 7.0, 700)
    yaw = 0.5 * jnp.sin(1.3 * t_imu) + 0.2 * t_imu
    t_cam = jnp.linspace(0.3, 6.5, 40)
    # camera observes the yaw value at (t_cam + td_true)
    yaw_cam = 0.5 * jnp.sin(1.3 * (t_cam + td_true)) + 0.2 * (t_cam + td_true)
    td, rms = cal.calibrate_time_offset(
        t_cam, yaw_cam, jnp.ones(40, bool), t_imu, yaw
    )
    assert abs(float(td) - td_true) < 0.004, float(td)
    assert float(rms) < 1e-3


def test_integrate_gyro_yaw():
    traj = syn.figure8_trajectory()
    ts = jnp.linspace(0.0, 2.0, 400)
    _, gyrs = syn.imu_samples(traj, ts)
    yaws = cal.integrate_gyro_yaw(ts, gyrs, q0=traj.quat(0.0))
    yaw_true = jnp.deg2rad(
        jax.vmap(lambda t: geo.rot_to_ypr(geo.quat_to_rot(traj.quat(t)))[0])(ts)
    )
    np.testing.assert_allclose(yaws, yaw_true, atol=2e-3)


# ---------------------------------------------------------------------------
# feature selector
# ---------------------------------------------------------------------------


def test_selector_prefers_informative_features():
    """Features visible over the horizon and well-conditioned must be chosen
    over features that leave the FOV."""
    h = sel.HORIZON
    # horizon: moving forward (+x body = +z cam with identity extrinsic here)
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    ps = jnp.stack([jnp.array([0.0, 0.0, 0.1 * k]) for k in range(h + 1)])
    qs = jnp.stack([ident] * (h + 1))
    q_ic, p_ic = ident, jnp.zeros(3)

    # candidates: first 5 dead ahead (visible all horizon), last 5 at extreme
    # angles (leave FOV immediately)
    rays = []
    for k in range(5):
        rays.append([0.05 * k - 0.1, 0.02 * k - 0.04, 1.0])
    for k in range(5):
        rays.append([3.5 + k, 2.0, 1.0])  # far outside img_fov
    rays = jnp.asarray(rays)
    rays = rays / rays[:, 2:3]
    depths = jnp.full(10, 4.0)
    valid = jnp.ones(10, bool)

    omega_f = sel.feature_information(
        rays, depths, valid, ps, qs, q_ic, p_ic, pix_sigma=1.0 / 460.0
    )
    omega_0 = sel.imu_prior_information(qs, dt=0.1, acc_var=0.04)
    cfg = sel.SelectorConfig()
    chosen, gains = sel.select_features(omega_0, omega_f, valid, budget=4, cfg=cfg)
    assert int(jnp.sum(chosen)) == 4
    assert bool(jnp.all(chosen[:5][jnp.asarray(np.flatnonzero(np.asarray(chosen[:5])))]))
    assert not bool(jnp.any(chosen[5:])), "out-of-FOV features selected"
    # gains of visible features strictly positive
    assert float(jnp.min(gains[:5])) > 0


def test_selector_horizon_propagation():
    traj = syn.figure8_trajectory()
    t0 = 1.0
    p0, q0 = traj.pos(t0), traj.quat(t0)
    v0 = syn.world_velocity(traj, t0)
    accs, gyrs = syn.imu_samples(traj, jnp.asarray([t0]))
    g = jnp.array([0.0, 0.0, syn.GRAVITY])
    ps, qs, vs = sel.propagate_horizon(
        p0, q0, v0, jnp.zeros(3), jnp.zeros(3), accs[0], gyrs[0], 0.1, g
    )
    assert ps.shape == (sel.HORIZON + 1, 3)
    # rough agreement with the true future (constant-IMU approximation)
    p_true = traj.pos(t0 + 0.4)
    assert float(jnp.linalg.norm(ps[-1] - p_true)) < 0.1


def test_selector_feature_info_matches_reference_structure():
    """feature_information parity with calcInfoFromFeatures:415-530: bearing
    factors C_i = B_iᵀB_i, landmark marginalized in closed form, Schur cross
    blocks −C_i W C_jᵀ on every state pair (45×45), zero when seen <2 poses."""
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    h = sel.HORIZON
    ps = jnp.stack([jnp.array([0.2 * k, 0.05 * k, 0.0]) for k in range(h + 1)])
    qs = jnp.stack([ident] * (h + 1))
    rays = jnp.asarray([[0.1, -0.05, 1.0], [5.0, 5.0, 1.0]])  # 2nd leaves FOV
    depths = jnp.asarray([4.0, 4.0])
    valid = jnp.ones(2, bool)
    O = sel.feature_information(rays, depths, valid, ps, qs, ident, jnp.zeros(3))
    assert O.shape == (2, 45, 45)
    Of = np.asarray(O[0])
    # symmetric PSD with nonzero CROSS-frame position coupling
    np.testing.assert_allclose(Of, Of.T, atol=1e-10)
    w = np.linalg.eigvalsh(Of)
    assert w.min() > -1e-8
    # state k (horizon index 0, the current estimator frame) carries NO
    # feature information: the landmark anchors at the PROPAGATED pose of
    # the new image (horizon index 1) and its blocks start there
    # (calcInfoFromFeatures Delta block 9*1; r4 advisor finding)
    np.testing.assert_allclose(Of[0:9, :], 0.0, atol=1e-12)
    cross = Of[9:12, 18:21]
    assert np.abs(cross).max() > 1e-3, "missing Schur cross-frame coupling"
    # the landmark's 3 dof are marginalized: the total information along the
    # landmark's own position directions has a 3-dim nullspace contribution
    # -> rank(Delta) <= 3*(H+1) - 3
    assert np.linalg.matrix_rank(Of, tol=1e-8) <= 3 * (h + 1) - 3
    # out-of-FOV feature (visible only at the observation frame) adds nothing
    np.testing.assert_allclose(np.asarray(O[1]), 0.0, atol=1e-12)


def test_selector_greedy_matches_bruteforce_logdet():
    """Greedy max-logdet selection overlap against brute-force enumeration
    on a small synthetic problem (the VERDICT-r3 validation ask)."""
    import itertools

    rng = np.random.default_rng(7)
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    h = sel.HORIZON
    ps = jnp.stack([jnp.array([0.15 * k, 0.0, 0.02 * k]) for k in range(h + 1)])
    qs = jnp.stack([ident] * (h + 1))
    N, budget = 8, 3
    rays = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.5, 0.5, (N, 2)), np.ones((N, 1))], axis=1
        )
    )
    depths = jnp.asarray(rng.uniform(2.0, 8.0, N))
    valid = jnp.ones(N, bool)
    Of = sel.feature_information(rays, depths, valid, ps, qs, ident, jnp.zeros(3))
    O0 = sel.imu_prior_information(qs, dt=0.1, acc_var=0.04)

    cfg = sel.SelectorConfig(max_features=budget)
    chosen, _ = sel.select_features(O0, Of, valid, budget=budget, cfg=cfg)
    greedy_set = frozenset(np.flatnonzero(np.asarray(chosen)).tolist())

    def logdet(M):
        return np.linalg.slogdet(np.asarray(M) + 1e-9 * np.eye(45))[1]

    best_set, best_ld = None, -np.inf
    for combo in itertools.combinations(range(N), budget):
        ld = logdet(O0 + sum(Of[i] for i in combo))
        if ld > best_ld:
            best_ld, best_set = ld, frozenset(combo)

    greedy_ld = logdet(O0 + sum(Of[i] for i in greedy_set))
    # greedy is (1-1/e)-optimal for submodular logdet; on this small problem
    # it should overlap the brute-force optimum in >= 2 of 3 picks and reach
    # >= 95% of the optimal logdet GAIN
    base = logdet(O0)
    assert len(greedy_set & best_set) >= 2, (greedy_set, best_set)
    assert (greedy_ld - base) >= 0.95 * (best_ld - base)
