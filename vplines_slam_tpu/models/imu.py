"""IMU mid-point preintegration with 15x15 jacobian and covariance propagation.

Parity with the reference's ``vins_estimator/src/factor/integration_base.h``
(midPointIntegration:54, propagate:170, evaluate:200, repropagate:38) —
re-designed as a single ``lax.scan`` over a fixed-capacity, mask-padded
sample buffer so one jitted kernel preintegrates any inter-frame batch, and
``vmap`` preintegrates all window intervals at once.

State order (O_P,O_R,O_V,O_BA,O_BG) = (0,3,6,9,12); noise order
[na0, ng0, na1, ng1, nba, nbg] (18), matching integration_base.h:21-27.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.geometry import (
    delta_quat,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rot,
    skew,
)


class ImuParams(NamedTuple):
    acc_n: jnp.ndarray  # accelerometer noise density
    gyr_n: jnp.ndarray  # gyro noise density
    acc_w: jnp.ndarray  # accelerometer random walk
    gyr_w: jnp.ndarray  # gyro random walk
    g: jnp.ndarray  # gravity in world, e.g. [0, 0, 9.81]


def default_params(dtype=jnp.float64):
    # euroc_config.yaml noise values
    return ImuParams(
        acc_n=jnp.asarray(0.08, dtype),
        gyr_n=jnp.asarray(0.004, dtype),
        acc_w=jnp.asarray(0.00004, dtype),
        gyr_w=jnp.asarray(2.0e-6, dtype),
        g=jnp.asarray([0.0, 0.0, 9.81007], dtype),
    )


class Preintegration(NamedTuple):
    """Result of preintegrating one IMU interval (all device arrays)."""

    delta_p: jnp.ndarray  # [3]
    delta_q: jnp.ndarray  # [4] wxyz
    delta_v: jnp.ndarray  # [3]
    jacobian: jnp.ndarray  # [15,15] d(state)/d(initial state + biases)
    covariance: jnp.ndarray  # [15,15]
    sum_dt: jnp.ndarray  # []
    linearized_ba: jnp.ndarray  # [3] bias linearization point
    linearized_bg: jnp.ndarray  # [3]


def _noise_cov(params: ImuParams, dtype):
    n = jnp.zeros((18, 18), dtype)
    an2 = (params.acc_n * params.acc_n).astype(dtype)
    gn2 = (params.gyr_n * params.gyr_n).astype(dtype)
    aw2 = (params.acc_w * params.acc_w).astype(dtype)
    gw2 = (params.gyr_w * params.gyr_w).astype(dtype)
    eye = jnp.eye(3, dtype=dtype)
    n = n.at[0:3, 0:3].set(an2 * eye)
    n = n.at[3:6, 3:6].set(gn2 * eye)
    n = n.at[6:9, 6:9].set(an2 * eye)
    n = n.at[9:12, 9:12].set(gn2 * eye)
    n = n.at[12:15, 12:15].set(aw2 * eye)
    n = n.at[15:18, 15:18].set(gw2 * eye)
    return n


def preintegrate(
    dts,
    accs,
    gyrs,
    mask,
    ba,
    bg,
    params: ImuParams,
) -> Preintegration:
    """Preintegrate a (padded) run of IMU samples.

    Args:
      dts:  [N]    per-step dt (step i integrates sample i-1 -> i)
      accs: [N+1, 3] raw accelerometer samples (accs[0] is the frame-start sample)
      gyrs: [N+1, 3] raw gyro samples
      mask: [N]    1.0 for real steps, 0.0 for padding (padded steps are no-ops)
      ba, bg: [3]  bias linearization points
      params: noise parameters

    Fixed shapes: N is the static capacity; real sample counts vary per frame
    and are expressed through the mask (the TPU-native replacement for the
    reference's std::vector push_back loop).
    """
    dtype = accs.dtype
    noise = _noise_cov(params, dtype)

    def step(carry, inp):
        dp, dq, dv, J, P = carry
        dt, acc0, gyr0, acc1, gyr1, m = inp
        dt = dt * m  # masked steps integrate over 0 time => exact no-op

        un_acc_0 = quat_rotate(dq, acc0 - ba)
        un_gyr = 0.5 * (gyr0 + gyr1) - bg
        dq_new = quat_normalize(quat_mul(dq, delta_quat(un_gyr * dt)))
        un_acc_1 = quat_rotate(dq_new, acc1 - ba)
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        dp_new = dp + dv * dt + 0.5 * un_acc * dt * dt
        dv_new = dv + un_acc * dt

        # jacobian & covariance propagation (integration_base.h:76-166)
        R0 = quat_to_rot(dq)
        R1 = quat_to_rot(dq_new)
        Rw = skew(un_gyr)
        Ra0 = skew(acc0 - ba)
        Ra1 = skew(acc1 - ba)
        I3 = jnp.eye(3, dtype=dtype)

        F = jnp.zeros((15, 15), dtype)
        F = F.at[0:3, 0:3].set(I3)
        F = F.at[0:3, 3:6].set(
            -0.25 * R0 @ Ra0 * dt * dt - 0.25 * R1 @ Ra1 @ (I3 - Rw * dt) * dt * dt
        )
        F = F.at[0:3, 6:9].set(I3 * dt)
        F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * dt * dt)
        F = F.at[0:3, 12:15].set(0.25 * R1 @ Ra1 * dt * dt * dt)
        F = F.at[3:6, 3:6].set(I3 - Rw * dt)
        F = F.at[3:6, 12:15].set(-I3 * dt)
        F = F.at[6:9, 3:6].set(
            -0.5 * R0 @ Ra0 * dt - 0.5 * R1 @ Ra1 @ (I3 - Rw * dt) * dt
        )
        F = F.at[6:9, 6:9].set(I3)
        F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * dt)
        F = F.at[6:9, 12:15].set(0.5 * R1 @ Ra1 * dt * dt)
        F = F.at[9:12, 9:12].set(I3)
        F = F.at[12:15, 12:15].set(I3)

        V = jnp.zeros((15, 18), dtype)
        V = V.at[0:3, 0:3].set(0.25 * R0 * dt * dt)
        v03 = -0.125 * R1 @ Ra1 * dt * dt * dt
        V = V.at[0:3, 3:6].set(v03)
        V = V.at[0:3, 6:9].set(0.25 * R1 * dt * dt)
        V = V.at[0:3, 9:12].set(v03)
        V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
        V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
        V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
        v63 = -0.25 * R1 @ Ra1 * dt * dt
        V = V.at[6:9, 3:6].set(v63)
        V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
        V = V.at[6:9, 9:12].set(v63)
        V = V.at[9:12, 12:15].set(I3 * dt)
        V = V.at[12:15, 15:18].set(I3 * dt)

        J_new = F @ J
        P_new = F @ P @ F.T + V @ noise @ V.T
        return (dp_new, dq_new, dv_new, J_new, P_new), None

    init = (
        jnp.zeros(3, dtype),
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
        jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype),
        jnp.zeros((15, 15), dtype),
    )
    inputs = (dts, accs[:-1], gyrs[:-1], accs[1:], gyrs[1:], mask.astype(dtype))
    (dp, dq, dv, J, P), _ = jax.lax.scan(step, init, inputs)
    return Preintegration(
        delta_p=dp,
        delta_q=dq,
        delta_v=dv,
        jacobian=J,
        covariance=P,
        sum_dt=jnp.sum(dts * mask.astype(dtype)),
        linearized_ba=ba,
        linearized_bg=bg,
    )


def evaluate(
    pre: Preintegration,
    params: ImuParams,
    Pi, Qi, Vi, Bai, Bgi,
    Pj, Qj, Vj, Baj, Bgj,
):
    """15-residual IMU factor (integration_base.h evaluate:200).

    Bias deviations from the linearization point are absorbed to first order
    via the preintegration jacobian blocks; no repropagation needed inside
    the optimizer's iterations.
    """
    J = pre.jacobian
    dp_dba = J[0:3, 9:12]
    dp_dbg = J[0:3, 12:15]
    dq_dbg = J[3:6, 12:15]
    dv_dba = J[6:9, 9:12]
    dv_dbg = J[6:9, 12:15]

    dba = Bai - pre.linearized_ba
    dbg = Bgi - pre.linearized_bg

    corrected_q = quat_mul(pre.delta_q, delta_quat(dq_dbg @ dbg))
    corrected_v = pre.delta_v + dv_dba @ dba + dv_dbg @ dbg
    corrected_p = pre.delta_p + dp_dba @ dba + dp_dbg @ dbg

    g = params.g.astype(Pi.dtype)
    dt = pre.sum_dt
    qi_inv = quat_conj(Qi)
    r_p = quat_rotate(qi_inv, 0.5 * g * dt * dt + Pj - Pi - Vi * dt) - corrected_p
    r_q = 2.0 * quat_mul(quat_conj(corrected_q), quat_mul(qi_inv, Qj))[1:4]
    r_v = quat_rotate(qi_inv, g * dt + Vj - Vi) - corrected_v
    return jnp.concatenate([r_p, r_q, r_v, Baj - Bai, Bgj - Bgi])


def sqrt_information(pre: Preintegration):
    """sqrt info = chol(cov)^-1 via Cholesky, matching imu_factor.h:37-39's
    LLT-based square-root whitening."""
    dtype = pre.covariance.dtype
    out_dtype = dtype
    if dtype == jnp.float32 and jax.config.jax_enable_x64 and (
        jax.default_backend() == "cpu"
    ):
        # covariance entries span ~1e-14..1e-2 — whiten in f64 when possible
        dtype = jnp.float64
    cov0 = pre.covariance.astype(dtype)
    eps = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-5, dtype)
    scale = jnp.maximum(jnp.diag(cov0), jnp.asarray(1e-30, dtype))
    if dtype == jnp.float32:
        # cap the whitening dynamic range: without f64, a covariance spread of
        # 1e-14..1e-2 would give S entries ~1e7 and a normal-equation
        # condition number far beyond f32.  Flooring at 1e-7·max(diag) bounds
        # κ(S) ≈ 3e3 at a slight loss of bias-constraint sharpness.
        scale = jnp.maximum(scale, 1e-2 * jnp.max(scale))
    cov = cov0 + jnp.diag(scale) * eps
    L = jnp.linalg.cholesky(cov)
    # cov = L Lᵀ  =>  S = L⁻¹ satisfies S cov Sᵀ = I (residual whitening)
    S = jax.scipy.linalg.solve_triangular(L, jnp.eye(15, dtype=dtype), lower=True)
    return S.astype(out_dtype)


def midpoint_propagate(p, q, v, ba, bg, acc0, gyr0, acc1, gyr1, dt, g):
    """World-frame IMU-rate forward propagation for low-latency odometry
    (estimator_node.cpp predict:68)."""
    un_acc_0 = quat_rotate(q, acc0 - ba) - g
    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    q_new = quat_normalize(quat_mul(q, delta_quat(un_gyr * dt)))
    un_acc_1 = quat_rotate(q_new, acc1 - ba) - g
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    p_new = p + v * dt + 0.5 * un_acc * dt * dt
    v_new = v + un_acc * dt
    return p_new, q_new, v_new
