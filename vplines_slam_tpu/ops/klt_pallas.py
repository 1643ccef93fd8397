"""Pallas TPU kernel for the pyramidal KLT level update.

The hottest front-end op (bench: ~18 ms of a 23 ms frame at 150 features).
The XLA path (ops/klt._track_level) issues 4 dynamic-slices per iteration
per feature from HBM; this kernel instead keeps the full pyramid level
(image + gradients, ≤ ~6 MB at 752x480 f32) resident in VMEM and runs every
LK iteration for one feature per grid step — zero HBM traffic inside the
iteration loop.

Falls back transparently to the XLA path off-TPU (ops/klt.py keeps both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lk_kernel(pts_ref, guess_ref, img0_ref, img1_ref, gx_ref, gy_ref,
               flow_ref, ok_ref, resid_ref, *, win, iters, min_eig, pad):
    """One grid step tracks one feature.

    pts/guess in SMEM (scalar prefetch); images in VMEM (full level, padded
    by `pad` on each side so slices never clamp).
    """
    i = pl.program_id(0)
    px = pts_ref[i, 0]
    py = pts_ref[i, 1]

    r = (win - 1) // 2
    W = win + 1

    def patch(ref, cx, cy):
        """W x W patch at float center (cx, cy) via slice + 4-tap blend."""
        x0 = jnp.floor(cx) - r
        y0 = jnp.floor(cy) - r
        fx = (cx - jnp.floor(cx)).astype(jnp.float32)
        fy = (cy - jnp.floor(cy)).astype(jnp.float32)
        xi = x0.astype(jnp.int32) + pad
        yi = y0.astype(jnp.int32) + pad
        big = ref[pl.ds(yi, W + 1), pl.ds(xi, W + 1)]
        return (
            big[:-1, :-1] * (1 - fx) * (1 - fy)
            + big[:-1, 1:] * fx * (1 - fy)
            + big[1:, :-1] * (1 - fx) * fy
            + big[1:, 1:] * fx * fy
        )[:win, :win]

    T = patch(img0_ref, px, py)
    Ix = patch(gx_ref, px, py)
    Iy = patch(gy_ref, px, py)

    a = jnp.sum(Ix * Ix)
    b = jnp.sum(Ix * Iy)
    c = jnp.sum(Iy * Iy)
    det = a * c - b * b
    n = win * win
    me = (c + a - jnp.sqrt((a - c) ** 2 + 4.0 * b * b)) / (2.0 * n)
    good = me > min_eig
    inv00 = jnp.where(det > 1e-12, c / det, 0.0)
    inv01 = jnp.where(det > 1e-12, -b / det, 0.0)
    inv11 = jnp.where(det > 1e-12, a / det, 0.0)

    def body(_, d):
        dx, dy = d
        I = patch(img1_ref, px + dx, py + dy)
        rimg = I - T
        g0 = jnp.sum(rimg * Ix)
        g1 = jnp.sum(rimg * Iy)
        sx = jnp.where(good, inv00 * g0 + inv01 * g1, 0.0)
        sy = jnp.where(good, inv01 * g0 + inv11 * g1, 0.0)
        return (dx - sx, dy - sy)

    d0 = (guess_ref[i, 0], guess_ref[i, 1])
    dx, dy = jax.lax.fori_loop(0, iters, body, d0)

    I = patch(img1_ref, px + dx, py + dy)
    resid = jnp.mean(jnp.abs(I - T))

    # per-feature scalar results live in SMEM (full [N, .] arrays; a (1, 2)
    # tiled VMEM block would violate the (8, 128) tiling rule)
    flow_ref[i, 0] = dx
    flow_ref[i, 1] = dy
    ok_ref[i, 0] = good.astype(jnp.int32)
    resid_ref[i, 0] = resid


@functools.partial(jax.jit, static_argnames=("win", "iters", "min_eig", "interpret"))
def track_level_pallas(img0, img1, gx, gy, pts, guess, win=21, iters=10,
                       min_eig=1e-4, interpret=False):
    """Pallas LK level update for all N features.

    img*/g*: [H, W] float32 (unpadded); pts/guess: [N, 2] float32.
    Returns (flow [N,2], ok [N] bool, resid [N]).
    """
    N = pts.shape[0]
    pad = win + 2
    padf = lambda a: jnp.pad(a, pad)
    img0p, img1p, gxp, gyp = padf(img0), padf(img1), padf(gx), padf(gy)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pts, guess
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )

    kernel = functools.partial(
        _lk_kernel, win=win, iters=iters, min_eig=min_eig, pad=pad
    )
    flow, ok, resid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        pts.astype(jnp.float32), guess.astype(jnp.float32),
        img0p.astype(jnp.float32), img1p.astype(jnp.float32),
        gxp.astype(jnp.float32), gyp.astype(jnp.float32),
    )
    return flow, ok[:, 0] > 0, resid[:, 0]
