#!/usr/bin/env python
"""Per-stage timing of the device VIO frame step (track_step components)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VPL_CPU"):
    from vplines_slam_tpu.utils.hostplatform import force_cpu

    force_cpu()

import jax
import jax.numpy as jnp
import numpy as np

from vplines_slam_tpu.estimator import slide as slide_mod
from vplines_slam_tpu.estimator import window as win_mod
from vplines_slam_tpu.utils import demo


def timeit(fn, n=10):
    def readback(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return np.asarray(jax.device_get(leaf)).ravel()[:1]

    r = fn(0)
    readback(r)
    t0 = time.time()
    for i in range(1, n + 1):
        r = fn(i)
    readback(r)
    return (time.time() - t0) / n


def main():
    dtype = jnp.float32
    cfg = win_mod.WindowConfig(max_points=96, max_lines=8, max_imu=32)
    state, data, params = demo.synthetic_window(
        cfg, dtype=dtype, n_landmarks=300, imu_per_interval=20, perturb=0.01
    )

    solve = jax.jit(
        lambda s, d: win_mod.solve_window(s, d, cfg, params, num_iters=8)
    )
    carry = {"sd": (state, data)}

    def f_solve(i):
        s, d, out = solve(*carry["sd"])
        carry["sd"] = (s, d)
        return out.cost

    print(f"solve_window(8): {timeit(f_solve)*1e3:.1f} ms")

    marg = jax.jit(lambda s, d: slide_mod.marginalize_old(s, d, cfg, params))
    pr = marg(state, data)
    print("prior J shape:", pr.J.shape)
    t_m = timeit(lambda i: marg(state._replace(p=state.p + i * 1e-6), data))
    print(f"marginalize_old: {t_m*1e3:.1f} ms")

    sl_old = jax.jit(
        lambda s, d: slide_mod.slide_window_old(s, d, cfg, params, pr)
    )
    t_so = timeit(lambda i: sl_old(state._replace(p=state.p + i * 1e-6), data))
    print(f"slide_window_old: {t_so*1e3:.1f} ms")

    sl_new = jax.jit(lambda s, d: slide_mod.slide_window_new(s, d, cfg, params))
    t_sn = timeit(lambda i: sl_new(state._replace(p=state.p + i * 1e-6), data))
    print(f"slide_window_new: {t_sn*1e3:.1f} ms")

    N = pr.J.shape[0]
    A = jnp.eye(N, dtype=dtype) + 1e-3 * jnp.ones((N, N), dtype)
    eigh = jax.jit(lambda a: jnp.linalg.eigh(a))
    t_e = timeit(lambda i: eigh(A + i * 1e-6))
    print(f"eigh[{N}]: {t_e*1e3:.1f} ms")
    chol = jax.jit(lambda a: jnp.linalg.cholesky(a))
    t_c = timeit(lambda i: chol(A + i * 1e-6))
    print(f"chol[{N}]: {t_c*1e3:.1f} ms")


if __name__ == "__main__":
    main()
