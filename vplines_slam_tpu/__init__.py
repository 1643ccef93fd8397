"""vplines_slam_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``multiplefish/VPLines-SLAM`` (a ROS1/C++ VINS-Mono derivative with line
features, vanishing-point residuals, an information-theoretic feature
selector, online time-offset calibration, loop closure and GNSS fusion).

Design stance (see SURVEY.md §7): not a port.  One device-resident,
fixed-shape, batched pipeline:

- ``ops``      — Pallas / XLA kernels for the hot paths (KLT patch tracking,
                 Shi-Tomasi scoring, line detection, VP sphere accumulation,
                 FAST/BRIEF, Hamming matching, block-sparse normal equations).
- ``models``   — camera models, IMU preintegration, the sliding-window VIO
                 estimator, pose graph, global fusion, feature selector.
- ``factors``  — residual functions (IMU, point, line, VP, prior, GNSS) with
                 autodiff jacobians.
- ``solver``   — one jitted Levenberg-Marquardt/Schur engine reused by BA,
                 line-only optimisation, marginalization, pose graph and
                 global fusion.
- ``parallel`` — jax.sharding meshes, distributed BA via collectives.
- ``utils``    — SO(3)/SE(3)/quaternion/Plücker algebra, config, datasets,
                 trajectory IO + ATE evaluation, tracing.
"""

__version__ = "0.1.0"

# SLAM is a geometry workload: metre-scale positions flow through 3x3/NxN
# matmuls everywhere (pose composition, normal equations, Schur reduction).
# TPU's default matmul precision multiplies in bfloat16, which injects
# ~centimetre errors at 5 m scale (measured: 1.7 cm on a pose-graph re-base
# that is exact to 6e-7 on CPU f32).  Force full-f32 MXU passes globally;
# image kernels that can tolerate bf16 opt back in locally if profiled.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
