import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.ops import corners as corners_mod
from vplines_slam_tpu.ops import image as image_mod
from vplines_slam_tpu.ops import klt as klt_mod


def smooth_texture(rng, H=120, W=160, octaves=4):
    """Band-limited random texture with trackable structure."""
    img = np.zeros((H, W))
    for o in range(octaves):
        h, w = H // (2**o), W // (2**o)
        layer = rng.standard_normal((max(h, 2), max(w, 2)))
        # upsample to full size by repetition + blur
        layer = np.kron(layer, np.ones((2**o, 2**o)))[:H, :W]
        img += layer / (o + 1)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray(
        np.asarray(image_mod.gaussian_blur(jnp.asarray(img, jnp.float64), 5, 1.0))
    )


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def shift_image(img, dx, dy):
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype), jnp.arange(W, dtype=img.dtype), indexing="ij")
    coords = jnp.stack([xx + dx, yy + dy], axis=-1)
    return image_mod.bilinear_sample(img, coords)


def test_bilinear_sample_identity(rng):
    img = smooth_texture(rng)
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype), jnp.arange(W, dtype=img.dtype), indexing="ij")
    out = image_mod.bilinear_sample(img, jnp.stack([xx, yy], -1))
    np.testing.assert_allclose(out, img, atol=1e-12)


def test_pyramid_shapes(rng):
    img = smooth_texture(rng)
    pyr = image_mod.build_pyramid(img, 3)
    assert pyr[0].shape == (120, 160)
    assert pyr[1].shape == (60, 80)
    assert pyr[2].shape == (30, 40)


def test_klt_recovers_known_shift(rng):
    img0 = smooth_texture(rng)
    dx, dy = 3.4, -2.2
    img1 = shift_image(img0, dx, dy)  # img1(x) = img0(x + d) => flow = -d
    pts = jnp.asarray(rng.uniform([30, 30], [130, 90], size=(20, 2)))
    pts1, ok, resid = klt_mod.track(img0, img1, pts)
    assert int(jnp.sum(ok)) >= 15
    flow = pts1 - pts
    np.testing.assert_allclose(
        flow[ok], jnp.broadcast_to(jnp.asarray([-dx, -dy]), flow[ok].shape), atol=0.1
    )


def test_klt_flags_bad_regions(rng):
    img0 = jnp.zeros((100, 100), jnp.float64)  # textureless
    img1 = img0
    pts = jnp.asarray([[50.0, 50.0], [20.0, 20.0]])
    _, ok, _ = klt_mod.track(img0, img1, pts)
    assert not bool(jnp.any(ok))


def test_klt_1d_directional(rng):
    img0 = smooth_texture(rng)
    d = jnp.asarray([0.6, 0.8])
    shift = 2.5
    img1 = shift_image(img0, shift * d[0], shift * d[1])
    pts = jnp.asarray(rng.uniform([30, 30], [130, 90], size=(15, 2)))
    dirs = jnp.broadcast_to(d, (15, 2))
    pts1, ok, resid = klt_mod.track_1d(img0, img1, pts, dirs)
    assert int(jnp.sum(ok)) >= 10
    v = jnp.sum((pts1 - pts) * dirs, axis=-1)
    np.testing.assert_allclose(v[ok], -shift, atol=0.15)


def test_corner_detection_finds_checkerboard_corners():
    H, W = 128, 128
    sq = 16
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = jnp.asarray((((yy // sq) + (xx // sq)) % 2).astype(np.float64))
    img = image_mod.gaussian_blur(img, 5, 1.0)
    xy, score, valid = corners_mod.detect(img, max_corners=60, min_dist=10)
    n = int(jnp.sum(valid))
    assert n >= 30
    # every detected corner is near a checkerboard grid crossing
    gx = np.round(np.asarray(xy[valid][:, 0]) / sq) * sq
    gy = np.round(np.asarray(xy[valid][:, 1]) / sq) * sq
    d = np.hypot(np.asarray(xy[valid][:, 0]) - gx, np.asarray(xy[valid][:, 1]) - gy)
    assert np.median(d) < 3.0


def test_corner_min_distance(rng):
    img = smooth_texture(rng)
    xy, score, valid = corners_mod.detect(img, max_corners=50, min_dist=20)
    pts = np.asarray(xy[valid])
    if len(pts) > 1:
        from scipy.spatial.distance import pdist

        assert pdist(pts).min() >= 1.0  # distinct cells (cell-based spacing)


def test_corner_avoids_existing(rng):
    img = smooth_texture(rng)
    xy0, _, v0 = corners_mod.detect(img, max_corners=10, min_dist=25)
    xy1, _, v1 = corners_mod.detect(
        img, max_corners=10, min_dist=25, existing_xy=xy0, existing_mask=v0
    )
    # no new corner lands in an occupied cell
    c0 = {(int(x // 25), int(y // 25)) for (x, y), ok in zip(np.asarray(xy0), v0) if ok}
    c1 = {(int(x // 25), int(y // 25)) for (x, y), ok in zip(np.asarray(xy1), v1) if ok}
    assert not (c0 & c1)


def test_clahe_improves_contrast(rng):
    img = smooth_texture(rng) * 0.2 + 0.4  # low contrast
    out = image_mod.clahe(img)
    assert float(jnp.std(out)) > float(jnp.std(img)) * 1.5
    assert out.shape == img.shape


def test_remap_undistort_consistency():
    """remap(undistort_map) produces an image where straight projection holds."""
    from vplines_slam_tpu.models import camera as cam_mod

    cam = cam_mod.pinhole(200.0, 200.0, 80.0, 60.0, k1=-0.25, k2=0.05,
                          width=160, height=120)
    m = cam_mod.undistort_rectify_map(cam)
    assert m.shape == (120, 160, 2)
    # the map at the principal point is identity
    assert abs(float(m[60, 80, 0]) - 80.0) < 1.0


def test_remap_static_matches_dense(rng):
    """Two-pass banded remap (remap_static) ≡ gather bilinear remap on a
    real radtan undistortion map, away from invalid borders."""
    from vplines_slam_tpu.models import camera as cam_mod

    cam = cam_mod.pinhole(200.0, 200.0, 80.0, 60.0, k1=-0.25, k2=0.05,
                          width=160, height=120)
    m = cam_mod.undistort_rectify_map(cam)
    img = image_mod.gaussian_blur(smooth_texture(rng, 120, 160), 5, 1.0)
    dense = image_mod.remap(img, m)
    plan = image_mod.build_remap_plan(m)
    fast = image_mod.remap_static(img, plan)
    ok = np.asarray(plan.valid) > 0
    err = np.abs(np.asarray(dense) - np.asarray(fast))[ok]
    assert err.max() < 5e-3, err.max()
