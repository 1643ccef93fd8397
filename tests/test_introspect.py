"""Introspection snapshot + sinks (utils/introspect.py) and the
cross-sequence retrieval exemption (models/pose_graph.retrieve_candidates).

Reference counterparts: visualization.cpp:41-62 publisher streams
(pubLinesCloud:378, selection_info) and detectLoop's candidate eligibility
(pose_graph.cpp:304-386).
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from vplines_slam_tpu.estimator import window as win_mod
from vplines_slam_tpu.models import pose_graph as pg
from vplines_slam_tpu.utils import demo
from vplines_slam_tpu.utils import introspect as intro


def _window(n_lines=24):
    cfg = win_mod.WindowConfig(max_points=48, max_lines=16, max_imu=16)
    state, data, _ = demo.synthetic_window(
        cfg, n_landmarks=120, imu_per_interval=8, n_lines=n_lines
    )
    return cfg, state, data


def test_window_snapshot_streams_populated():
    cfg, state, data = _window()
    snap = intro.window_snapshot(state, data, cfg)
    # camera stream: one pose per window frame
    assert snap.cam_p.shape == (cfg.nf, 3)
    # solved points appear in the world cloud with plausible depths
    assert int(snap.pt_valid.sum()) > 10
    d = np.asarray(snap.pt_depth)[np.asarray(snap.pt_valid)]
    assert (d > 0.1).all() and (d < 50).all()
    # line segments: triangulated lines produce finite trimmed endpoints
    assert int(snap.ln_valid.sum()) >= 1
    seg = np.asarray(snap.ln_world)[np.asarray(snap.ln_valid)]
    assert np.isfinite(seg).all()
    # statuses are within the palette and the newest frame sees tracks
    assert set(np.unique(np.asarray(snap.pt_status))) <= {0, 1, 2, 3}
    assert int((np.asarray(snap.pt_status) > 0).sum()) > 0


def test_sink_and_overlays_write_files(tmp_path):
    cfg, state, data = _window()
    snap = intro.window_snapshot(state, data, cfg)

    sink = intro.IntrospectionSink(str(tmp_path / "intro"))
    sink.write(1.25, snap)
    sink.write(1.35, snap)
    sink.close()
    lines = open(tmp_path / "intro" / "index.jsonl").read().splitlines()
    assert len(lines) == 2
    row = json.loads(lines[0])
    assert row["t"] == 1.25 and row["n_points"] > 0
    with np.load(tmp_path / "intro" / row["file"]) as z:
        assert z["pt_world"].shape == (cfg.max_points, 3)

    svg = tmp_path / "overlay.svg"
    intro.render_overlay_svg(snap, str(svg))
    body = svg.read_text()
    assert "<svg" in body and "<circle" in body

    ply = tmp_path / "cloud.ply"
    intro.export_ply(snap, str(ply))
    head = ply.read_text().splitlines()
    assert head[0] == "ply"
    n_vert = int(next(l for l in head if l.startswith("element vertex")).split()[-1])
    assert n_vert > cfg.nf  # at least cameras + some points


def test_vocab_cache_survives_retracing():
    """The signature vocabulary cache must hold host data, not trace-time
    values: populating it inside one jit trace and reusing it from a SECOND
    jit trace (a fresh SlamSystem in the same process — multi-session
    relocalization) raised UnexpectedTracerError before r5."""
    import jax

    from vplines_slam_tpu.ops import brief as brief_mod

    brief_mod._VOCAB_CACHE.clear()
    desc = jnp.zeros((8, 8), jnp.uint32)
    val = jnp.ones((8,), bool)
    f1 = jax.jit(lambda d, v: brief_mod.global_signature(d, v))
    f2 = jax.jit(lambda d, v: brief_mod.global_signature(d, v) * 1.0)
    f1(desc, val)
    f2(desc, val)  # must not see a tracer leaked by f1's trace


def test_retrieval_cross_sequence_exempt_from_recency():
    """A candidate inside the recency exclusion zone IS eligible when it
    belongs to another sequence (loaded map / earlier session) — the r4
    advisor found the host-side exemption unreachable because the device
    mask had already dropped it."""
    cfg = pg.PoseGraphConfig(max_keyframes=64, skip_recent=20, top_k=4)
    db = pg.empty_db(cfg)
    rng = np.random.default_rng(1)
    n = 30
    sigs = rng.standard_normal((n, db.sig.shape[1])).astype(np.float32)
    sigs /= np.linalg.norm(sigs, axis=1, keepdims=True)
    seq = np.ones(db.seq.shape[0], np.int32)
    seq[25] = 0  # keyframe 25: loaded prior map, inside the recency zone
    db = db._replace(
        count=jnp.asarray(n, jnp.int32),
        sig=db.sig.at[:n].set(jnp.asarray(sigs)),
        seq=jnp.asarray(seq),
    )
    # query matches keyframe 25 exactly
    q = jnp.asarray(sigs[25])
    # without query_seq: recency mask kills it
    idx, score, _ = pg.retrieve_candidates(db, cfg, q)
    assert 25 not in np.asarray(idx)
    # with query_seq=1: the cross-sequence candidate survives and ranks first
    idx, score, _ = pg.retrieve_candidates(db, cfg, q, query_seq=jnp.asarray(1))
    assert int(idx[0]) == 25
    # same-sequence recent keyframes are still excluded
    q2 = jnp.asarray(sigs[27])
    idx2, _, _ = pg.retrieve_candidates(db, cfg, q2, query_seq=jnp.asarray(1))
    assert 27 not in np.asarray(idx2)
