"""Image primitives: gradients, pyramids, bilinear sampling, CLAHE.

XLA-native replacements for the OpenCV calls in the reference front-end
(``feature_tracker.cpp``: cv::createCLAHE:113, cv::buildOpticalFlowPyramid
inside calcOpticalFlowPyrLK:139, cv::remap undistort
``line_feature_tracker.cpp:62``).  Convolutions map onto the MXU; sampling is
batched gathers.  Images are float32 [H, W] in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv2d_same(img, kernel, precision="default"):
    """Single-channel 2D convolution, SAME padding.

    Small kernels (everything in this front-end: 3x3 gradients, 1x5/5x1
    blurs) are unrolled into shift-and-add on padded slices: a
    single-channel NCHW XLA conv pays ~1 ms of layout/dispatch overhead per
    call on TPU, while the shifted adds are pure fused VPU work (~30 us at
    752x480).  Larger kernels fall back to the XLA conv.
    """
    kh, kw = kernel.shape
    if kh * kw <= 49 and not isinstance(kernel, jax.core.Tracer):
        rh, rw = kh // 2, kw // 2
        H, W = img.shape
        p = jnp.pad(img, ((rh, rh), (rw, rw)))
        out = None
        kv = jnp.asarray(kernel)
        for i in range(kh):
            for j in range(kw):
                w = float(kv[i, j])
                if w == 0.0:
                    continue
                term = w * jax.lax.dynamic_slice(p, (i, j), (H, W))
                out = term if out is None else out + term
        return out if out is not None else jnp.zeros_like(img)
    return jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :].astype(img.dtype),
        window_strides=(1, 1),
        padding="SAME",
        precision=precision,
    )[0, 0]


def scharr_gradients(img):
    """Scharr x/y gradients (OpenCV cv::Scharr parity, /32 normalization)."""
    kx = jnp.array([[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]]) / 32.0
    ky = kx.T
    return _conv2d_same(img, kx), _conv2d_same(img, ky)


def sobel_gradients(img):
    kx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
    ky = kx.T
    return _conv2d_same(img, kx), _conv2d_same(img, ky)


def gaussian_blur(img, ksize=5, sigma=1.0):
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=img.dtype)
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    img = _conv2d_same(img, g[None, :])
    return _conv2d_same(img, g[:, None])


def box_filter(img, ksize):
    k = jnp.ones((ksize, ksize), img.dtype)
    return _conv2d_same(img, k)


def pyr_down(img):
    """Half-resolution with 5-tap binomial smoothing (cv::pyrDown parity)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    img = _conv2d_same(img, k[None, :])
    img = _conv2d_same(img, k[:, None])
    return img[::2, ::2]


def build_pyramid(img, levels):
    """List of images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def bilinear_sample(img, xy, pad_value=0.0):
    """Sample img at float coords xy [..., 2] = (x, y); out-of-bounds -> pad.

    The gather core of KLT patch extraction and undistortion remap.
    """
    H, W = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, v, jnp.asarray(pad_value, img.dtype))

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def remap(img, map_xy):
    """Dense remap: out[i,j] = img(map_xy[i,j]) (cv::remap parity)."""
    return bilinear_sample(img, map_xy)


def clahe(img, clip_limit=3.0, tiles=8, bins=256):
    """Contrast-limited adaptive histogram equalization
    (cv::createCLAHE(3.0, 8x8), feature_tracker.cpp:115).

    Tile histograms with clipping + bilinear interpolation of the per-tile
    transfer functions; fully batched (one-hot histogram = matmul-friendly).
    """
    H, W = img.shape
    th, tw = H // tiles, W // tiles
    imgc = img[: th * tiles, : tw * tiles]
    x = jnp.clip(imgc, 0.0, 1.0)
    q = jnp.minimum((x * bins).astype(jnp.int32), bins - 1)
    tiles_q = q.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3).reshape(
        tiles * tiles, th * tw
    )
    hist = jax.vmap(lambda t: jnp.bincount(t, length=bins))(tiles_q).astype(img.dtype)
    # clip and redistribute
    limit = clip_limit * (th * tw) / bins
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / bins
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]
    luts = cdf.reshape(tiles, tiles, bins)

    # bilinear interpolation between tile LUTs
    yy = (jnp.arange(H, dtype=img.dtype) + 0.5) / th - 0.5
    xx = (jnp.arange(W, dtype=img.dtype) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    qf = jnp.minimum((jnp.clip(img, 0.0, 1.0) * bins).astype(jnp.int32), bins - 1)

    def lut_at(ty, tx):
        return luts[ty[:, None], tx[None, :], qf]

    out = (
        lut_at(y0, x0) * (1 - fy) * (1 - fx)
        + lut_at(y0, x1) * (1 - fy) * fx
        + lut_at(y1, x0) * fy * (1 - fx)
        + lut_at(y1, x1) * fy * fx
    )
    return out
