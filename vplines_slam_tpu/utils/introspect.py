"""Live-system introspection: device-side window snapshots + host sinks.

The reference publishes 18 rviz streams for debugging (points cloud, lines
cloud + history, camera frusta, key poses, selection overlay —
``vins_estimator/src/utility/visualization.cpp:41-62``, pubLinesCloud:378,
CameraPoseVisualization.cpp).  The TPU-native equivalent is one jittable
``window_snapshot`` that extracts every stream's data from the device state
in a single program (one readback), plus host-side serialization (JSONL /
NPZ) and a matplotlib-free SVG overlay renderer for frame dumps.

Typical use (wired into SlamSystem via ``introspect_every``):

    snap = jax.jit(lambda s, d: window_snapshot(s, d, cfg))(state, data)
    sink.write(t, jax.device_get(snap))
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import quat_conj, quat_mul, quat_rotate, quat_to_rot
from .plucker import orth_to_plk, pi_from_ppp, plk_transform


class WindowSnapshot(NamedTuple):
    """Fixed-shape device snapshot of everything the reference publishes.

    Masks gate validity; world frame is the estimator's (gauge-fixed) VIO
    frame.  One pytree -> one device_get."""

    # camera frusta (pubCameraPose / key poses): camera-in-world pose per frame
    cam_p: jnp.ndarray  # [NF, 3]
    cam_q: jnp.ndarray  # [NF, 4]
    # points cloud (pubPointCloud): solved world landmarks
    pt_world: jnp.ndarray  # [MAXP, 3]
    pt_valid: jnp.ndarray  # [MAXP]
    pt_id: jnp.ndarray  # [MAXP]
    pt_track_len: jnp.ndarray  # [MAXP] observations in window
    pt_depth: jnp.ndarray  # [MAXP] anchor depth
    # lines cloud (pubLinesCloud:378): 3D segments trimmed by the newest obs
    ln_world: jnp.ndarray  # [MAXL, 2, 3] endpoints
    ln_valid: jnp.ndarray  # [MAXL]
    ln_id: jnp.ndarray  # [MAXL]
    ln_track_len: jnp.ndarray  # [MAXL]
    ln_has_vp: jnp.ndarray  # [MAXL] any VP-classified observation in window
    # selection overlay (pubSelectionInfo analog): per-track status in the
    # newest frame — 0 absent, 1 tracked-unsolved, 2 solved, 3 solved+long
    pt_status: jnp.ndarray  # [MAXP]
    pt_uv: jnp.ndarray  # [MAXP, 2] normalized coords in newest frame
    ln_uv: jnp.ndarray  # [MAXL, 4] segment endpoints in newest frame
    ln_status: jnp.ndarray  # [MAXL]


def line_trim_endpoints(orth_w, obs, q_wc, p_wc, dtype=None):
    """3D endpoints of a world Plücker line trimmed by one observation.

    The infinite line is intersected with the two planes through the camera
    center orthogonal-ish to the observed endpoints (the reference's
    endpoint-trim in removeLineOutlier:702-760 / pubLinesCloud).  Returns
    ([2,3] world endpoints, finite_ok)."""
    dtype = dtype or orth_w.dtype
    R_cw = quat_to_rot(quat_conj(q_wc))
    t_cw = -R_cw @ p_wc
    plk_c = plk_transform(orth_to_plk(orth_w), R_cw, t_cw)
    nc, vc = plk_c[0:3], plk_c[3:6]
    sk = jnp.array(
        [[0.0, -nc[2], nc[1]], [nc[2], 0.0, -nc[0]], [-nc[1], nc[0], 0.0]],
        dtype,
    )
    Lc = jnp.zeros((4, 4), dtype)
    Lc = Lc.at[0:3, 0:3].set(sk).at[0:3, 3].set(vc).at[3, 0:3].set(-vc)
    p11 = jnp.concatenate([obs[0:2], jnp.ones(1, dtype)])
    p21 = jnp.concatenate([obs[2:4], jnp.ones(1, dtype)])
    ln = jnp.cross(p11, p21)[0:2]
    ln = ln / jnp.maximum(jnp.linalg.norm(ln), 1e-12)
    p12 = p11 + jnp.concatenate([ln, jnp.zeros(1, dtype)])
    p22 = p21 + jnp.concatenate([ln, jnp.zeros(1, dtype)])
    zero = jnp.zeros(3, dtype)
    pi1 = pi_from_ppp(zero, p11, p12)
    pi2 = pi_from_ppp(zero, p21, p22)
    e1 = Lc @ pi1
    e2 = Lc @ pi2
    e1 = e1 / jnp.where(jnp.abs(e1[3]) > 1e-12, e1[3], 1e-12)
    e2 = e2 / jnp.where(jnp.abs(e2[3]) > 1e-12, e2[3], 1e-12)
    ok = (
        jnp.all(jnp.isfinite(e1)) & jnp.all(jnp.isfinite(e2))
        & (e1[2] > 0) & (e2[2] > 0)
    )
    w1 = quat_rotate(q_wc, e1[0:3]) + p_wc
    w2 = quat_rotate(q_wc, e2[0:3]) + p_wc
    return jnp.stack([w1, w2]), ok


def window_snapshot(state, data, cfg) -> WindowSnapshot:
    """Extract every publisher stream from the window state — pure/jittable."""
    nf = cfg.nf
    newest = nf - 1
    q_wc = jax.vmap(lambda q: quat_mul(q, state.q_ic))(state.q)
    p_wc = state.p + jax.vmap(lambda q: quat_rotate(q, state.p_ic))(state.q)

    # points
    def pt_one(slot):
        i = data.pt_start[slot]
        z = 1.0 / jnp.clip(data.pt_inv_depth[slot], 1e-4, 1e4)
        Xw = quat_rotate(q_wc[i], data.pt_obs[slot, i] * z) + p_wc[i]
        return Xw, z

    pt_world, pt_depth = jax.vmap(pt_one)(jnp.arange(cfg.max_points))
    pt_len = jnp.sum(data.pt_mask, axis=1)
    pt_valid = (data.pt_id >= 0) & data.pt_solved
    seen_new = data.pt_mask[:, newest] & (data.pt_id >= 0)
    pt_status = jnp.where(
        seen_new,
        jnp.where(
            data.pt_solved, jnp.where(pt_len >= nf // 2, 3, 2), 1
        ),
        0,
    ).astype(jnp.int32)

    # lines: trim by the newest observation (fall back to the anchor)
    def ln_one(slot):
        has_new = data.ln_mask[slot, newest]
        j = jnp.where(has_new, newest, jnp.argmax(data.ln_mask[slot]))
        seg, ok = line_trim_endpoints(
            data.ln_orth[slot], data.ln_obs[slot, j], q_wc[j], p_wc[j],
            dtype=state.p.dtype,
        )
        return seg, ok

    ln_world, ln_ok = jax.vmap(ln_one)(jnp.arange(cfg.max_lines))
    ln_len = jnp.sum(data.ln_mask, axis=1)
    ln_valid = (data.ln_id >= 0) & data.ln_solved & ln_ok
    ln_seen = data.ln_mask[:, newest] & (data.ln_id >= 0)
    ln_status = jnp.where(
        ln_seen, jnp.where(data.ln_solved, 2, 1), 0
    ).astype(jnp.int32)

    return WindowSnapshot(
        cam_p=p_wc, cam_q=q_wc,
        pt_world=pt_world, pt_valid=pt_valid, pt_id=data.pt_id,
        pt_track_len=pt_len.astype(jnp.int32), pt_depth=pt_depth,
        ln_world=ln_world, ln_valid=ln_valid, ln_id=data.ln_id,
        ln_track_len=ln_len.astype(jnp.int32),
        ln_has_vp=jnp.any(data.ln_vp_mask & data.ln_mask, axis=1),
        pt_status=pt_status, pt_uv=data.pt_obs[:, newest, 0:2],
        ln_uv=data.ln_obs[:, newest], ln_status=ln_status,
    )


class IntrospectionSink:
    """Host-side recorder: NPZ per snapshot + a JSONL index.

    Directory layout:
      <dir>/index.jsonl   one line per snapshot {t, file, counts...}
      <dir>/snap_<k>.npz  raw arrays of WindowSnapshot
    """

    def __init__(self, out_dir):
        self.dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._k = 0
        self._index = open(os.path.join(out_dir, "index.jsonl"), "a")

    def write(self, t, snap: WindowSnapshot):
        snap = jax.tree_util.tree_map(np.asarray, snap)
        fn = f"snap_{self._k:06d}.npz"
        np.savez_compressed(
            os.path.join(self.dir, fn), **snap._asdict()
        )
        self._index.write(
            json.dumps(
                {
                    "t": float(t),
                    "file": fn,
                    "n_points": int(snap.pt_valid.sum()),
                    "n_lines": int(snap.ln_valid.sum()),
                    "n_lines_vp": int((snap.ln_valid & snap.ln_has_vp).sum()),
                }
            )
            + "\n"
        )
        self._index.flush()
        self._k += 1

    def close(self):
        self._index.close()


# ---------------------------------------------------------------------------
# overlay rendering (image_show / selection_info equivalents, no matplotlib)
# ---------------------------------------------------------------------------

_STATUS_COLORS = {0: "#666666", 1: "#d08020", 2: "#20a040", 3: "#2060d0"}


def render_overlay_svg(snap: WindowSnapshot, path, focal=460.0,
                       cx=376.0, cy=240.0, width=752, height=480):
    """Write an SVG overlay of the newest frame's tracks: points colored by
    status (grey absent / orange unsolved / green solved / blue long track),
    line segments red (no VP) or purple (VP-classified) — the image_show +
    selection_info debugging view without an image dependency."""
    snap = jax.tree_util.tree_map(np.asarray, snap)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="#101018"/>',
    ]
    for s in range(len(snap.pt_status)):
        if snap.pt_status[s] == 0:
            continue
        u = cx + focal * snap.pt_uv[s, 0]
        v = cy + focal * snap.pt_uv[s, 1]
        if not (0 <= u < width and 0 <= v < height):
            continue
        c = _STATUS_COLORS[int(snap.pt_status[s])]
        parts.append(f'<circle cx="{u:.1f}" cy="{v:.1f}" r="3" fill="{c}"/>')
    for s in range(len(snap.ln_status)):
        if snap.ln_status[s] == 0:
            continue
        x1 = cx + focal * snap.ln_uv[s, 0]
        y1 = cy + focal * snap.ln_uv[s, 1]
        x2 = cx + focal * snap.ln_uv[s, 2]
        y2 = cy + focal * snap.ln_uv[s, 3]
        col = "#b040d0" if snap.ln_has_vp[s] else "#d04040"
        w = 2 if snap.ln_status[s] == 2 else 1
        parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="{col}" stroke-width="{w}"/>'
        )
    parts.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(parts))


def export_ply(snap: WindowSnapshot, path):
    """Dump the snapshot's world geometry as an ASCII PLY (points + line
    segments as edges + camera positions) for external viewers — the
    lines-cloud / history-cloud artifact."""
    snap = jax.tree_util.tree_map(np.asarray, snap)
    pts = [snap.pt_world[snap.pt_valid.astype(bool)]]
    pts.append(snap.cam_p)
    edges = []
    base = sum(len(p) for p in pts)
    ln = snap.ln_world[snap.ln_valid.astype(bool)]
    for k in range(len(ln)):
        pts.append(ln[k])
        edges.append((base + 2 * k, base + 2 * k + 1))
    P = np.concatenate(pts, axis=0)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(P)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element edge {len(edges)}\n"
            "property int vertex1\nproperty int vertex2\nend_header\n"
        )
        for p in P:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
        for a, b in edges:
            f.write(f"{a} {b}\n")
