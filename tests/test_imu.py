import jax
import jax.numpy as jnp
import numpy as np

from vplines_slam_tpu.models import imu
from vplines_slam_tpu.utils import synthetic as syn
from vplines_slam_tpu.utils.geometry import quat_conj, quat_mul, quat_rotate


def make_interval(t0=1.0, t1=1.5, hz=200, ba=None, bg=None, noise=False):
    traj = syn.figure8_trajectory()
    n = int((t1 - t0) * hz)
    times = jnp.linspace(t0, t1, n + 1)
    accs, gyrs = syn.imu_samples(
        traj,
        times,
        acc_bias=ba,
        gyr_bias=bg,
        acc_noise=0.01 if noise else 0.0,
        gyr_noise=0.001 if noise else 0.0,
    )
    dts = jnp.diff(times)
    mask = jnp.ones_like(dts)
    return traj, times, dts, accs, gyrs, mask


def states_at(traj, t):
    p = traj.pos(t)
    q = traj.quat(t)
    v = syn.world_velocity(traj, t)
    return p, q, v


def test_preintegration_zero_residual_on_truth():
    traj, times, dts, accs, gyrs, mask = make_interval()
    params = imu.default_params()
    pre = imu.preintegrate(dts, accs, gyrs, mask, jnp.zeros(3), jnp.zeros(3), params)

    Pi, Qi, Vi = states_at(traj, times[0])
    Pj, Qj, Vj = states_at(traj, times[-1])
    z3 = jnp.zeros(3)
    r = imu.evaluate(pre, params, Pi, Qi, Vi, z3, z3, Pj, Qj, Vj, z3, z3)
    # discretization error only: mid-point at 200 Hz over 0.5 s
    assert float(jnp.max(jnp.abs(r))) < 2e-4, r


def test_preintegration_matches_direct_numpy_integration():
    # independent plain-numpy mid-point integration as golden reference
    traj, times, dts, accs, gyrs, mask = make_interval(t0=0.3, t1=0.7)
    params = imu.default_params()
    pre = imu.preintegrate(dts, accs, gyrs, mask, jnp.zeros(3), jnp.zeros(3), params)

    dp = np.zeros(3)
    dq = np.array([1.0, 0, 0, 0])
    dv = np.zeros(3)
    A = np.asarray(accs)
    G = np.asarray(gyrs)
    D = np.asarray(dts)

    def qmul(q, p):
        w1, x1, y1, z1 = q
        w2, x2, y2, z2 = p
        return np.array(
            [
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ]
        )

    def qrot(q, v):
        w, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        return R @ v

    for i in range(len(D)):
        dt = D[i]
        un_acc_0 = qrot(dq, A[i])
        un_gyr = 0.5 * (G[i] + G[i + 1])
        dq_new = qmul(dq, np.array([1.0, *(un_gyr * dt / 2)]))
        dq_new /= np.linalg.norm(dq_new)
        un_acc_1 = qrot(dq_new, A[i + 1])
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        dp = dp + dv * dt + 0.5 * un_acc * dt * dt
        dv = dv + un_acc * dt
        dq = dq_new

    np.testing.assert_allclose(pre.delta_p, dp, atol=1e-10)
    np.testing.assert_allclose(pre.delta_v, dv, atol=1e-10)
    np.testing.assert_allclose(pre.delta_q, dq, atol=1e-10)


def test_padding_mask_is_noop():
    traj, times, dts, accs, gyrs, mask = make_interval()
    params = imu.default_params()
    pre = imu.preintegrate(dts, accs, gyrs, mask, jnp.zeros(3), jnp.zeros(3), params)

    # pad with garbage samples under a zero mask
    pad = 17
    dts_p = jnp.concatenate([dts, jnp.full((pad,), 123.0)])
    accs_p = jnp.concatenate([accs, jnp.full((pad, 3), 55.0)])
    gyrs_p = jnp.concatenate([gyrs, jnp.full((pad, 3), -9.0)])
    mask_p = jnp.concatenate([mask, jnp.zeros((pad,))])
    pre_p = imu.preintegrate(
        dts_p, accs_p, gyrs_p, mask_p, jnp.zeros(3), jnp.zeros(3), params
    )
    np.testing.assert_allclose(pre_p.delta_p, pre.delta_p, atol=1e-12)
    np.testing.assert_allclose(pre_p.delta_q, pre.delta_q, atol=1e-12)
    np.testing.assert_allclose(pre_p.delta_v, pre.delta_v, atol=1e-12)
    np.testing.assert_allclose(pre_p.covariance, pre.covariance, atol=1e-12)
    np.testing.assert_allclose(pre_p.sum_dt, pre.sum_dt, atol=1e-12)


def test_bias_jacobian_first_order():
    """First-order bias correction must match repropagation with shifted bias
    (the purpose of integration_base.h's jacobian blocks)."""
    traj, times, dts, accs, gyrs, mask = make_interval()
    params = imu.default_params()
    z3 = jnp.zeros(3)
    pre0 = imu.preintegrate(dts, accs, gyrs, mask, z3, z3, params)

    dba = jnp.asarray([3e-3, -2e-3, 1e-3])
    dbg = jnp.asarray([-1e-3, 2e-3, 1.5e-3])
    pre1 = imu.preintegrate(dts, accs, gyrs, mask, dba, dbg, params)

    J = pre0.jacobian
    dp_pred = pre0.delta_p + J[0:3, 9:12] @ dba + J[0:3, 12:15] @ dbg
    dv_pred = pre0.delta_v + J[6:9, 9:12] @ dba + J[6:9, 12:15] @ dbg
    dq_pred = quat_mul(
        pre0.delta_q,
        jnp.concatenate([jnp.ones(1), 0.5 * (J[3:6, 12:15] @ dbg)]),
    )
    dq_pred = dq_pred / jnp.linalg.norm(dq_pred)

    # second-order error ~ |db|^2
    assert float(jnp.max(jnp.abs(dp_pred - pre1.delta_p))) < 5e-6
    assert float(jnp.max(jnp.abs(dv_pred - pre1.delta_v))) < 5e-6
    assert float(jnp.max(jnp.abs(dq_pred - pre1.delta_q))) < 5e-6


def test_covariance_psd_and_scales():
    traj, times, dts, accs, gyrs, mask = make_interval()
    params = imu.default_params()
    pre = imu.preintegrate(dts, accs, gyrs, mask, jnp.zeros(3), jnp.zeros(3), params)
    eig = jnp.linalg.eigvalsh(pre.covariance)
    assert float(eig[0]) > -1e-16
    # doubling noise quadruples covariance
    params2 = params._replace(acc_n=params.acc_n * 2, gyr_n=params.gyr_n * 2,
                              acc_w=params.acc_w * 2, gyr_w=params.gyr_w * 2)
    pre2 = imu.preintegrate(dts, accs, gyrs, mask, jnp.zeros(3), jnp.zeros(3), params2)
    np.testing.assert_allclose(pre2.covariance, 4.0 * pre.covariance, rtol=1e-9)


def test_sqrt_information_whitens():
    traj, times, dts, accs, gyrs, mask = make_interval()
    params = imu.default_params()
    pre = imu.preintegrate(dts, accs, gyrs, mask, jnp.zeros(3), jnp.zeros(3), params)
    S = imu.sqrt_information(pre)
    W = S @ pre.covariance @ S.T
    np.testing.assert_allclose(W, jnp.eye(15), atol=1e-6)


def test_midpoint_propagate_tracks_truth():
    traj = syn.figure8_trajectory()
    hz = 200
    times = jnp.linspace(0.0, 1.0, hz + 1)
    accs, gyrs = syn.imu_samples(traj, times)
    g = jnp.array([0.0, 0.0, syn.GRAVITY])
    p = traj.pos(times[0])
    q = traj.quat(times[0])
    v = syn.world_velocity(traj, times[0])
    for i in range(hz):
        dt = times[i + 1] - times[i]
        p, q, v = imu.midpoint_propagate(
            p, q, v, jnp.zeros(3), jnp.zeros(3), accs[i], gyrs[i], accs[i + 1], gyrs[i + 1], dt, g
        )
    p_true = traj.pos(times[-1])
    assert float(jnp.linalg.norm(p - p_true)) < 1e-3


def test_preintegrate_vmaps_over_intervals():
    traj, times, dts, accs, gyrs, mask = make_interval(t0=0.0, t1=2.0, hz=100)
    params = imu.default_params()
    # split into 4 intervals of 50 steps and vmap
    K, S = 4, 50
    dts_b = dts.reshape(K, S)
    mask_b = mask.reshape(K, S)
    accs_b = jnp.stack([accs[i * S : i * S + S + 1] for i in range(K)])
    gyrs_b = jnp.stack([gyrs[i * S : i * S + S + 1] for i in range(K)])
    z3 = jnp.zeros(3)
    pre = jax.vmap(
        lambda d, a, g, m: imu.preintegrate(d, a, g, m, z3, z3, params)
    )(dts_b, accs_b, gyrs_b, mask_b)
    assert pre.delta_p.shape == (K, 3)
    assert pre.covariance.shape == (K, 15, 15)
