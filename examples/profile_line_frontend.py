#!/usr/bin/env python
"""Per-stage timing of the line front-end on the current backend:
detect (EDLine), match (anchor-KLT), VP detect, full step."""

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

from vplines_slam_tpu.models import camera as cam_mod
from vplines_slam_tpu.models import line_tracker as lt_mod
from vplines_slam_tpu.ops import line_match as lmatch_mod
from vplines_slam_tpu.ops import lines as lines_mod
from vplines_slam_tpu.ops import vp as vp_mod
from vplines_slam_tpu.ops.image import bilinear_sample, clahe, gaussian_blur


def make_texture(rng, H, W):
    img = np.zeros((H, W), np.float32)
    for o in range(5):
        l = rng.standard_normal((H // (2**o) + 1, W // (2**o) + 1))
        img += np.kron(l, np.ones((2**o, 2**o)))[:H, :W] / (o + 1)
    img = (img - img.min()) / (img.max() - img.min())
    img = 0.25 + 0.5 * img
    for y in range(40, H, 96):
        img[y : y + 3, :] *= 0.25
    for x in range(40, W, 112):
        img[:, x : x + 3] *= 0.25
    return img


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
    rng = np.random.default_rng(1)
    H, W = 480, 752
    cam = cam_mod.pinhole(460.0, 460.0, W / 2, H / 2, width=W, height=H)
    img0 = jnp.asarray(make_texture(rng, H, W), dtype)
    img0 = gaussian_blur(img0, 5, 0.8)
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    img1 = bilinear_sample(img0, jnp.stack([xx + 2.0, yy - 1.5], -1))
    imgs = [img0, img1]

    cfg = lt_mod.LineTrackerConfig(max_lines=64)
    L = cfg.max_lines
    det_cfg = cfg.detect._replace(max_lines=L)

    det = jax.jit(lambda im: lines_mod.detect_lines(clahe(im), det_cfg))
    segs0, lens0, valid0 = det(img0)
    segs1, lens1, valid1 = det(img1)
    print("detect valid:", int(valid0.sum()), int(valid1.sum()), file=sys.stderr)
    t_det = timeit(lambda i: det(imgs[i % 2] + i * 1e-6))
    print(f"detect_lines: {t_det*1e3:.1f} ms")

    mat = jax.jit(
        lambda a, b, s0, v0, s1, v1: lmatch_mod.match_lines(
            a, b, s0, v0, s1, v1, cfg.match
        )
    )
    t_mat = timeit(lambda i: mat(img0 + i * 1e-6, img1, segs0, valid0, segs1, valid1))
    print(f"match_lines: {t_mat*1e3:.1f} ms")

    key = jax.random.PRNGKey(0)
    vpd = jax.jit(
        lambda s, v, k: vp_mod.detect_vps(s, v, cam.fx, cam.cx, cam.cy, k, cfg.vp)
    )
    keys = jax.random.split(key, 32)
    t_vp = timeit(lambda i: vpd(segs1, valid1, keys[i % 32]))
    print(f"detect_vps: {t_vp*1e3:.1f} ms")

    fe = lt_mod.LineTrackerFrontend(cam, cfg, dtype=dtype)
    fe.process(0.0, img0)
    fe.process(0.1, img1)
    t_full = timeit(lambda i: fe.process(0.2 + 0.1 * i, imgs[i % 2]).endpoints)
    print(f"full step: {t_full*1e3:.1f} ms")


if __name__ == "__main__":
    main()
