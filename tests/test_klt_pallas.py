"""Pallas KLT kernel vs the XLA reference implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.ops import klt as klt_mod
from vplines_slam_tpu.ops import klt_pallas
from vplines_slam_tpu.ops.image import bilinear_sample, scharr_gradients


def make_pair(rng, H=120, W=160, dx=3.4, dy=-2.2):
    from tests.test_frontend_ops import smooth_texture

    img0 = jnp.asarray(np.asarray(smooth_texture(rng, H, W)), jnp.float32)
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    img1 = bilinear_sample(img0, jnp.stack([xx + dx, yy + dy], -1)).astype(jnp.float32)
    return img0, img1


def test_pallas_level_matches_reference():
    rng = np.random.default_rng(3)
    img0, img1 = make_pair(rng)
    gx, gy = scharr_gradients(img0)
    pts = jnp.asarray(rng.uniform([30, 30], [130, 90], (24, 2)), jnp.float32)
    guess = jnp.zeros((24, 2), jnp.float32)

    flow_p, ok_p, resid_p = klt_pallas.track_level_pallas(
        img0, img1, gx, gy, pts, guess, interpret=True
    )
    flow_r, ok_r, resid_r = klt_mod._track_level(
        img0, img1, pts, guess, klt_mod.KLTConfig(), jnp.float32
    )
    sel = np.asarray(ok_p & ok_r)
    assert sel.sum() >= 20
    np.testing.assert_allclose(
        np.asarray(flow_p)[sel], np.asarray(flow_r)[sel], atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(resid_p)[sel], np.asarray(resid_r)[sel], atol=5e-3
    )


def test_pallas_recovers_shift():
    rng = np.random.default_rng(5)
    img0, img1 = make_pair(rng, dx=2.0, dy=1.5)
    gx, gy = scharr_gradients(img0)
    pts = jnp.asarray(rng.uniform([30, 30], [130, 90], (16, 2)), jnp.float32)
    flow, ok, resid = klt_pallas.track_level_pallas(
        img0, img1, gx, gy, pts, jnp.zeros((16, 2), jnp.float32), interpret=True
    )
    f = np.asarray(flow)[np.asarray(ok)]
    np.testing.assert_allclose(f, np.tile([-2.0, -1.5], (len(f), 1)), atol=0.08)
