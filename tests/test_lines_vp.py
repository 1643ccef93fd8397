import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.ops import image as image_mod
from vplines_slam_tpu.ops import line_match as lm_mod
from vplines_slam_tpu.ops import lines as lines_mod
from vplines_slam_tpu.ops import vp as vp_mod


def draw_segment(img, x1, y1, x2, y2, value=1.0, width=1.5):
    H, W = img.shape
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ab = np.array([x2 - x1, y2 - y1])
    L = np.linalg.norm(ab)
    t = ((xx - x1) * ab[0] + (yy - y1) * ab[1]) / (L * L)
    proj_x = x1 + np.clip(t, 0, 1) * ab[0]
    proj_y = y1 + np.clip(t, 0, 1) * ab[1]
    d = np.hypot(xx - proj_x, yy - proj_y)
    return np.maximum(img, value * np.exp(-(d**2) / (2 * width**2)))


def make_line_image(segs, H=240, W=320):
    img = np.zeros((H, W))
    for x1, y1, x2, y2 in segs:
        img = draw_segment(img, x1, y1, x2, y2)
    return jnp.asarray(img)


def seg_endpoint_error(est, truth):
    """Min over endpoint orderings of max endpoint distance."""
    a = max(
        np.hypot(est[0] - truth[0], est[1] - truth[1]),
        np.hypot(est[2] - truth[2], est[3] - truth[3]),
    )
    b = max(
        np.hypot(est[0] - truth[2], est[1] - truth[3]),
        np.hypot(est[2] - truth[0], est[3] - truth[1]),
    )
    return min(a, b)


def test_detect_lines_on_synthetic():
    truth = [
        (40.0, 50.0, 260.0, 60.0),
        (60.0, 200.0, 280.0, 150.0),
        (150.0, 30.0, 160.0, 210.0),
    ]
    img = make_line_image(truth)
    segs, lens, valid = lines_mod.detect_lines(
        img, lines_mod.LineDetectConfig(min_len=40.0, max_lines=16)
    )
    found = np.asarray(segs[valid])
    assert len(found) >= 3, f"only {len(found)} lines found"

    def on_line_coverage(f, t):
        """(max perpendicular deviation, covered fraction) of found seg f
        against truth line t."""
        a = np.array(t[:2])
        b = np.array(t[2:])
        u = (b - a) / np.linalg.norm(b - a)
        n = np.array([-u[1], u[0]])
        d1 = abs((f[:2] - a) @ n)
        d2 = abs((f[2:] - a) @ n)
        t1 = (f[:2] - a) @ u
        t2 = (f[2:] - a) @ u
        L = np.linalg.norm(b - a)
        cov = (min(max(t1, t2), L) - max(min(t1, t2), 0.0)) / L
        return max(d1, d2), cov

    for t in truth:
        stats = [on_line_coverage(f, t) for f in found]
        # some found segment is collinear (≤4px) and covers ≥50% of the truth
        # segment (junction splitting legitimately shortens segments, as the
        # reference's EDLine does)
        ok = any(d < 4.0 and c > 0.5 for d, c in stats)
        assert ok, f"segment {t} not recovered: {stats}"


def test_classify_hv():
    segs = jnp.asarray(
        [
            [0.0, 0.0, 100.0, 5.0],  # horizontal
            [0.0, 0.0, 5.0, 100.0],  # vertical
            [0.0, 0.0, 100.0, 100.0],  # diagonal
        ]
    )
    valid = jnp.ones(3, bool)
    h, v = lines_mod.classify_hv(segs, valid)
    assert bool(h[0]) and not bool(v[0])
    assert bool(v[1]) and not bool(h[1])


def project_3d_segments(dirs_lengths, f=300.0, cx=160.0, cy=120.0, seed=0):
    """3D Manhattan segments -> pixel segments."""
    rng = np.random.default_rng(seed)
    segs = []
    for d, L in dirs_lengths:
        mid = rng.uniform([-2, -1.5, 4], [2, 1.5, 8])
        a = mid - np.asarray(d) * L / 2
        b = mid + np.asarray(d) * L / 2
        if a[2] < 0.5 or b[2] < 0.5:
            continue
        ua = (f * a[0] / a[2] + cx, f * a[1] / a[2] + cy)
        ub = (f * b[0] / b[2] + cx, f * b[1] / b[2] + cy)
        segs.append([ua[0], ua[1], ub[0], ub[1]])
    return np.asarray(segs)


def test_vp_detection_manhattan():
    rng = np.random.default_rng(4)
    dirs = []
    for k in range(36):
        d = np.eye(3)[k % 3]
        dirs.append((d, rng.uniform(1.0, 2.5)))
    segs = project_3d_segments(dirs, seed=5)
    L = 48
    segs_pad = np.zeros((L, 4))
    segs_pad[: len(segs)] = segs
    valid = np.zeros(L, bool)
    valid[: len(segs)] = True

    vps, vp_id, ok = vp_mod.detect_vps(
        jnp.asarray(segs_pad), jnp.asarray(valid), 300.0, 160.0, 120.0,
        jax.random.PRNGKey(1),
    )
    assert bool(ok)
    # recovered VPs must align with the 3 axes (up to sign and permutation)
    vps = np.asarray(vps)
    axes = np.eye(3)
    used = set()
    for v in vps:
        align = np.abs(axes @ v)
        best = int(np.argmax(align))
        assert align[best] > 0.98, f"vp {v} not axis-aligned ({align})"
        used.add(best)
    assert used == {0, 1, 2}
    # most structural lines classified (not label 3)
    frac = float(np.mean(np.asarray(vp_id)[valid] != 3))
    assert frac > 0.7


def test_vp_temporal_consistency_swap():
    vps = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    prev = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    out = vp_mod.vps_temporal_consistency(vps, prev, jnp.asarray(True))
    np.testing.assert_allclose(out[0], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(out[1], [0.0, 1.0, 0.0])


def test_line_matching_shifted_frame():
    rng = np.random.default_rng(9)
    # textured background so anchor patches are trackable
    from tests.test_frontend_ops import smooth_texture

    bg = np.asarray(smooth_texture(rng, H=240, W=320)) * 0.5
    truth = [
        (50.0, 60.0, 250.0, 80.0),
        (70.0, 180.0, 260.0, 140.0),
        (140.0, 40.0, 150.0, 200.0),
        (40.0, 120.0, 200.0, 220.0),
    ]
    img0 = np.maximum(bg, np.asarray(make_line_image(truth)))
    dx, dy = 6.0, -4.0
    img1 = np.asarray(
        image_mod.bilinear_sample(
            jnp.asarray(img0),
            jnp.stack(
                jnp.meshgrid(
                    jnp.arange(320, dtype=jnp.float64) + dx,
                    jnp.arange(240, dtype=jnp.float64) + dy,
                    indexing="xy",
                ),
                -1,
            ),
        )
    )
    L = 8
    segs0 = np.zeros((L, 4))
    segs0[: len(truth)] = truth
    valid0 = np.zeros(L, bool)
    valid0[: len(truth)] = True
    segs1 = segs0.copy()
    segs1[: len(truth), [0, 2]] -= dx
    segs1[: len(truth), [1, 3]] -= dy
    # shuffle current-frame order
    perm = np.array([2, 0, 3, 1, 4, 5, 6, 7])
    segs1 = segs1[perm]
    valid1 = valid0[perm]

    match, votes = lm_mod.match_lines(
        jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(segs0), jnp.asarray(valid0),
        jnp.asarray(segs1), jnp.asarray(valid1),
    )
    match = np.asarray(match)
    inv = np.argsort(perm)
    for i in range(4):
        assert match[i] == inv[i], f"line {i}: got {match[i]}, want {inv[i]}"
