"""Affine-warp KLT (klt.h getAffineModel parity) on a real mh04 frame with a
simulated viewpoint change: the warped-template tracker must recover the
known affine motion where the pure-translation tracker degrades."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.ops import klt as klt_mod
from vplines_slam_tpu.ops.image import bilinear_sample, gaussian_blur
from vplines_slam_tpu.utils.dataset import REFERENCE_MH04_FIXTURE, load_image

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_MH04_FIXTURE), reason="fixture images not present"
)


def _affine_pair(A, t):
    """img1(x) = img0(A⁻¹ (x - t)) — a known affine viewpoint change."""
    img0 = jnp.asarray(
        load_image(os.path.join(REFERENCE_MH04_FIXTURE, "1.png")), jnp.float32
    )
    img0 = gaussian_blur(img0, 5, 0.8)
    H, W = img0.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    xy = jnp.stack([xx, yy], -1) - jnp.asarray(t, jnp.float32)
    A_inv = jnp.linalg.inv(jnp.asarray(A, jnp.float32))
    src = xy @ A_inv.T
    img1 = bilinear_sample(img0, src)
    return img0, img1, H, W


def test_affine_mode_beats_translation_under_scale_shear():
    # 12% scale + shear: a strong viewpoint change for 15px patches
    A = np.asarray([[1.12, 0.08], [0.02, 1.10]])
    t = np.asarray([6.0, -4.0])
    img0, img1, H, W = _affine_pair(A, t)

    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(
        rng.uniform([60, 60], [W - 60, H - 60], size=(64, 2)), jnp.float32
    )
    # ground-truth target positions
    gt = pts0 @ jnp.asarray(A, jnp.float32).T + jnp.asarray(t, jnp.float32)
    flow0 = gt - pts0

    cfg = klt_mod.KLTConfig(win=15, levels=3, iters=10)
    # plain translation-only KLT, seeded with the true flow (best case)
    p_tr, ok_tr, res_tr = klt_mod.track(img0, img1, pts0, cfg, init_flow=flow0)
    # affine mode: template warped by the known A⁻¹ relative to cur coords
    A_inv = jnp.broadcast_to(
        jnp.linalg.inv(jnp.asarray(A, jnp.float32)), (64, 2, 2)
    )
    p_af, ok_af, res_af = klt_mod.track(
        img0, img1, pts0, cfg, init_flow=flow0, affine_inv=A_inv
    )

    err_tr = np.linalg.norm(np.asarray(p_tr - gt), axis=1)
    err_af = np.linalg.norm(np.asarray(p_af - gt), axis=1)
    in_tr = np.asarray(ok_tr)
    in_af = np.asarray(ok_af)
    # affine mode: most surviving tracks within 1px of the true warp
    good_af = (err_af < 1.0) & in_af
    assert good_af.sum() >= 0.6 * max(in_af.sum(), 1), (
        good_af.sum(), in_af.sum()
    )
    # and it beats the translation tracker on matched-residual quality
    med_af = np.median(np.asarray(res_af)[in_af]) if in_af.any() else np.inf
    med_tr = np.median(np.asarray(res_tr)[in_tr]) if in_tr.any() else np.inf
    assert med_af < med_tr, (med_af, med_tr)


def test_affine_from_pose_identity():
    """Zero relative motion -> identity affine."""
    A = klt_mod.affine_from_pose(
        jnp.asarray([100.0, 120.0]), jnp.asarray(3.0),
        jnp.eye(3), jnp.zeros(3), 460.0, 460.0, 376.0, 240.0,
    )
    np.testing.assert_allclose(np.asarray(A), np.eye(2), atol=1e-4)


def test_affine_from_pose_scale_from_approach():
    """Moving the camera toward the scene scales patches up."""
    # ref at z=4, cur camera 1m closer along z: x_cur = x_ref - [0,0,1]
    A = klt_mod.affine_from_pose(
        jnp.asarray([376.0, 240.0]), jnp.asarray(4.0),
        jnp.eye(3), jnp.asarray([0.0, 0.0, -1.0]), 460.0, 460.0, 376.0, 240.0,
    )
    np.testing.assert_allclose(np.asarray(A), np.eye(2) * (4.0 / 3.0), rtol=1e-3)
