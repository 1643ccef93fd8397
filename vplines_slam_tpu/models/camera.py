"""Camera models: pinhole+radtan, Kannala-Brandt (equidistant), MEI (catadioptric).

Capability parity with the reference's camodocal stack
(``camera_model/src/camera_models/{PinholeCamera,EquidistantCamera,CataCamera}.cc``;
abstract interface ``camera_model/include/camodocal/camera_models/Camera.h:76-94``
— ``liftProjective`` pixel->ray, ``spaceToPlane`` project+distort,
``initUndistortRectifyMap``) — re-designed for JAX: a camera is a plain pytree
of parameters, every op is batched and fixed-iteration so it fuses under jit.

All lifts use a fixed number of fixed-point/Newton iterations instead of the
reference's data-dependent convergence loops (TPU-friendly; 8 iterations is
beyond float32 convergence for realistic distortion).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

PINHOLE = 0
EQUIDISTANT = 1  # Kannala-Brandt, camodocal "KANNALA_BRANDT"
MEI = 2  # unified catadioptric, camodocal "MEI"
SCARAMUZZA = 3  # omnidirectional polynomial, camodocal "SCARAMUZZA"

_LIFT_ITERS = 8


class CameraModel(NamedTuple):
    """Parameter pytree for any supported model.

    dist layout per kind:
      PINHOLE:     [k1, k2, p1, p2, 0]
      EQUIDISTANT: [k2, k3, k4, k5, 0]   (Kannala-Brandt θ-polynomial)
      MEI:         [xi, k1, k2, p1, p2]
      SCARAMUZZA:  [a0, a2, a3, a4, 0]   (forward ρ-poly z = a0 + a2ρ² + a3ρ³
                   + a4ρ⁴; fx/fy/cx/cy act as the affine [c d; e 1] + center)
    """

    kind: int
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [5]
    width: int = 752
    height: int = 480


def pinhole(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, width=752, height=480):
    return CameraModel(
        PINHOLE,
        jnp.asarray(fx),
        jnp.asarray(fy),
        jnp.asarray(cx),
        jnp.asarray(cy),
        jnp.asarray([k1, k2, p1, p2, 0.0]),
        width,
        height,
    )


def equidistant(fx, fy, cx, cy, k2=0.0, k3=0.0, k4=0.0, k5=0.0, width=752, height=480):
    return CameraModel(
        EQUIDISTANT,
        jnp.asarray(fx),
        jnp.asarray(fy),
        jnp.asarray(cx),
        jnp.asarray(cy),
        jnp.asarray([k2, k3, k4, k5, 0.0]),
        width,
        height,
    )


def scaramuzza(a0, a2, a3, a4, cx, cy, width=752, height=480):
    """Omnidirectional polynomial model (ScaramuzzaCamera.cc parity): the
    back-projection ray is [u, v, f(ρ)] with f(ρ)=a0+a2ρ²+a3ρ³+a4ρ⁴ (a1=0
    by construction).  Affine skew is taken as identity (camodocal default)."""
    return CameraModel(
        SCARAMUZZA,
        jnp.asarray(1.0),
        jnp.asarray(1.0),
        jnp.asarray(cx),
        jnp.asarray(cy),
        jnp.asarray([a0, a2, a3, a4, 0.0]),
        width,
        height,
    )


def mei(gamma1, gamma2, u0, v0, xi, k1=0.0, k2=0.0, p1=0.0, p2=0.0, width=752, height=480):
    return CameraModel(
        MEI,
        jnp.asarray(gamma1),
        jnp.asarray(gamma2),
        jnp.asarray(u0),
        jnp.asarray(v0),
        jnp.asarray([xi, k1, k2, p1, p2]),
        width,
        height,
    )


# ---------------------------------------------------------------------------
# distortion primitives (normalized image plane), batched over leading dims
# ---------------------------------------------------------------------------


def _radtan_distort(xy, k1, k2, p1, p2):
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    rad = k1 * r2 + k2 * r2 * r2
    dx = x * rad + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x + dx, y + dy], axis=-1)


def _radtan_undistort(xy_d, k1, k2, p1, p2):
    """Newton inverse of the rad-tan model.

    The reference uses an 8-step fixed-point recursion
    (PinholeCamera.cc liftProjective 'recursive distortion model'); Newton
    with an analytic 2x2 jacobian converges quadratically, so 5 fixed
    iterations beat its accuracy at lower cost.
    """
    xy = xy_d
    for _ in range(5):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        rad = k1 * r2 + k2 * r2 * r2
        fx_ = x * (1.0 + rad) + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) - xy_d[..., 0]
        fy_ = y * (1.0 + rad) + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y - xy_d[..., 1]
        drad_dr2 = k1 + 2.0 * k2 * r2
        j00 = 1.0 + rad + 2.0 * x * x * drad_dr2 + 2.0 * p1 * y + 6.0 * p2 * x
        j01 = 2.0 * x * y * drad_dr2 + 2.0 * p1 * x + 2.0 * p2 * y
        j10 = 2.0 * x * y * drad_dr2 + 2.0 * p1 * x + 2.0 * p2 * y
        j11 = 1.0 + rad + 2.0 * y * y * drad_dr2 + 6.0 * p1 * y + 2.0 * p2 * x
        det = j00 * j11 - j01 * j10
        x = x - (j11 * fx_ - j01 * fy_) / det
        y = y - (-j10 * fx_ + j00 * fy_) / det
        xy = jnp.stack([x, y], axis=-1)
    return xy


def _kb_theta_poly(theta, k2, k3, k4, k5):
    t2 = theta * theta
    return theta * (1.0 + t2 * (k2 + t2 * (k3 + t2 * (k4 + t2 * k5))))


def _kb_theta_inverse(theta_d, k2, k3, k4, k5):
    """Newton inversion of the KB θ-polynomial, fixed iterations
    (EquidistantCamera.cc backprojectSymmetric equivalent)."""
    theta = theta_d
    for _ in range(_LIFT_ITERS):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k2 + t2 * (k3 + t2 * (k4 + t2 * k5)))) - theta_d
        df = 1.0 + t2 * (3.0 * k2 + t2 * (5.0 * k3 + t2 * (7.0 * k4 + t2 * 9.0 * k5)))
        theta = theta - f / df
    return theta


# ---------------------------------------------------------------------------
# public interface
# ---------------------------------------------------------------------------


def project(cam: CameraModel, X):
    """3D point(s) in camera frame -> pixel coords (spaceToPlane parity).

    Returns (uv [..,2], valid mask) — valid is False behind the camera for
    projective models.
    """
    if cam.kind == PINHOLE:
        z = X[..., 2]
        xy = X[..., 0:2] / z[..., None]
        k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
        xyd = _radtan_distort(xy, k1, k2, p1, p2)
        u = cam.fx * xyd[..., 0] + cam.cx
        v = cam.fy * xyd[..., 1] + cam.cy
        return jnp.stack([u, v], axis=-1), z > 0
    if cam.kind == EQUIDISTANT:
        r = jnp.linalg.norm(X[..., 0:2], axis=-1)
        theta = jnp.arctan2(r, X[..., 2])
        td = _kb_theta_poly(theta, cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3])
        scale = td / jnp.maximum(r, 1e-12)
        u = cam.fx * scale * X[..., 0] + cam.cx
        v = cam.fy * scale * X[..., 1] + cam.cy
        return jnp.stack([u, v], axis=-1), theta < jnp.pi
    if cam.kind == MEI:
        xi = cam.dist[0]
        norm = jnp.linalg.norm(X, axis=-1)
        zs = X[..., 2] + xi * norm
        xy = X[..., 0:2] / zs[..., None]
        k1, k2, p1, p2 = cam.dist[1], cam.dist[2], cam.dist[3], cam.dist[4]
        xyd = _radtan_distort(xy, k1, k2, p1, p2)
        u = cam.fx * xyd[..., 0] + cam.cx
        v = cam.fy * xyd[..., 1] + cam.cy
        return jnp.stack([u, v], axis=-1), zs > 0
    if cam.kind == SCARAMUZZA:
        # find ρ s.t. the ray [ρ·d̂, f(ρ)] aligns with X: Newton on
        # g(ρ) = f(ρ)·r - z·ρ  where r = ||X_xy||, z = X_z
        a0, a2, a3, a4 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
        r = jnp.linalg.norm(X[..., 0:2], axis=-1)
        z = X[..., 2]
        rho = jnp.full_like(r, 100.0)
        for _ in range(_LIFT_ITERS):
            f = a0 + rho * rho * (a2 + rho * (a3 + rho * a4))
            df = rho * (2.0 * a2 + rho * (3.0 * a3 + rho * 4.0 * a4))
            g = f * r - z * rho
            dg = df * r - z
            rho = jnp.clip(rho - g / jnp.where(jnp.abs(dg) < 1e-12, 1e-12, dg), 0.0, 2000.0)
        scale = rho / jnp.maximum(r, 1e-12)
        u = X[..., 0] * scale + cam.cx
        v = X[..., 1] * scale + cam.cy
        return jnp.stack([u, v], axis=-1), jnp.ones_like(z, bool)
    raise ValueError(f"unknown camera kind {cam.kind}")


def lift(cam: CameraModel, uv):
    """Pixel coords -> normalized image coords [x, y, 1] (liftProjective parity)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    xy_d = jnp.stack([mx, my], axis=-1)
    if cam.kind == PINHOLE:
        k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
        xy = _radtan_undistort(xy_d, k1, k2, p1, p2)
    elif cam.kind == EQUIDISTANT:
        theta_d = jnp.linalg.norm(xy_d, axis=-1)
        theta = _kb_theta_inverse(
            theta_d, cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
        )
        scale = jnp.tan(theta) / jnp.maximum(theta_d, 1e-12)
        xy = xy_d * scale[..., None]
    elif cam.kind == MEI:
        xi = cam.dist[0]
        k1, k2, p1, p2 = cam.dist[1], cam.dist[2], cam.dist[3], cam.dist[4]
        xy = _radtan_undistort(xy_d, k1, k2, p1, p2)
        # unproject to unit sphere then to z=1 plane (CataCamera.cc:liftProjective)
        r2 = jnp.sum(xy * xy, axis=-1)
        disc = 1.0 + (1.0 - xi * xi) * r2
        zs = (xi + jnp.sqrt(jnp.maximum(disc, 0.0))) / (1.0 + r2)
        lam = zs[..., None]
        z = lam[..., 0] - xi
        xy = xy * lam / jnp.maximum(z, 1e-12)[..., None]
    elif cam.kind == SCARAMUZZA:
        # direct back-projection: ray = [u', v', f(ρ)] normalized to z=1
        a0, a2, a3, a4 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
        up = uv[..., 0] - cam.cx
        vp = uv[..., 1] - cam.cy
        rho = jnp.sqrt(up * up + vp * vp)
        f = a0 + rho * rho * (a2 + rho * (a3 + rho * a4))
        fz = jnp.where(jnp.abs(f) < 1e-9, 1e-9, f)
        xy = jnp.stack([up / fz, vp / fz], axis=-1)
    else:
        raise ValueError(f"unknown camera kind {cam.kind}")
    ones = jnp.ones_like(xy[..., :1])
    return jnp.concatenate([xy, ones], axis=-1)


def lift_to_sphere(cam: CameraModel, uv):
    """Pixel -> unit ray (for the unit-sphere reprojection residual)."""
    r = lift(cam, uv)
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)


def undistort_rectify_map(cam: CameraModel, fx_new=None, fy_new=None, cx_new=None, cy_new=None):
    """Dense remap grid from an ideal-pinhole output image into the distorted
    input (initUndistortRectifyMap parity, Camera.h:94).

    Returns map_xy [H, W, 2]: for each undistorted output pixel, the source
    pixel in the raw image.  Sampling with ops.image.remap_bilinear applies it.
    """
    fx_new = cam.fx if fx_new is None else fx_new
    fy_new = cam.fy if fy_new is None else fy_new
    cx_new = cam.cx if cx_new is None else cx_new
    cy_new = cam.cy if cy_new is None else cy_new
    H, W = cam.height, cam.width
    v, u = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    x = (u - cx_new) / fx_new
    y = (v - cy_new) / fy_new
    X = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    uv_src, _ = project(cam, X)
    return uv_src


def virtual_pinhole(cam: CameraModel, focal=460.0):
    """The reference's 'virtual focal' camera used for F-RANSAC thresholds
    (feature_tracker.cpp rejectWithF:226): pinhole, no distortion, centred."""
    return pinhole(
        focal, focal, cam.width / 2.0, cam.height / 2.0, width=cam.width, height=cam.height
    )
