"""The full SLAM system: front-ends -> VIO -> loop closure -> global fusion.

The single-process, device-resident equivalent of the reference's 6-node ROS
graph (SURVEY §1): images and IMU go in, VIO odometry + drift-corrected
poses come out.  Stages communicate through device arrays instead of
serialized PointCloud topics; the host only routes.

  feature_tracker node    -> models.feature_tracker.FeatureTrackerFrontend
  linefeature_tracker     -> models.line_tracker.LineTrackerFrontend
  vins_estimator          -> estimator.vio.VioEngine
  pose_graph              -> models.pose_graph (KeyframeDB + 4-DoF PGO)
  global_fusion           -> models.global_fusion
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..estimator.vio import VioEngine, unpack_output
from ..estimator.window import WindowConfig
from ..models import camera as cam_mod
from ..models import global_fusion as gf_mod
from ..models import imu as imu_mod
from ..models import pose_graph as pg_mod
from ..models.feature_tracker import FeatureTrackerFrontend, TrackerConfig
from ..models.line_tracker import LineTrackerConfig, LineTrackerFrontend
from ..utils.geometry import quat_conj, quat_mul, quat_rotate


class SystemOutput(NamedTuple):
    t: float
    p_vio: np.ndarray
    q_vio: np.ndarray
    p_corrected: np.ndarray  # after pose-graph drift correction
    q_corrected: np.ndarray
    is_keyframe: bool
    loop_closed: bool
    # host-side per-stage wall-clock ms of the producing add_image call
    # (frontend / line_frontend / vio_dispatch / fetch_finish / loop_stage;
    # printStatistics/TicToc parity — utils/stats.py)
    timings: Optional[dict] = None
    ba_cost: float = float("nan")


class SlamSystem:
    """Monocular visual-inertial SLAM with optional lines, loop closure and
    GNSS fusion."""

    def __init__(
        self,
        cam: cam_mod.CameraModel,
        window_cfg: WindowConfig = WindowConfig(),
        tracker_cfg: TrackerConfig = TrackerConfig(),
        line_cfg: Optional[LineTrackerConfig] = None,
        pg_cfg: pg_mod.PoseGraphConfig = pg_mod.PoseGraphConfig(),
        fusion_cfg: Optional[gf_mod.FusionConfig] = None,
        imu_params: Optional[imu_mod.ImuParams] = None,
        q_ic=None,
        p_ic=None,
        use_loop_closure: bool = True,
        stream_gap_restart: float = 1.0,
        use_feature_selector: bool = False,
        selector_cfg=None,
        estimate_extrinsic=None,
        estimate_td: bool = False,
        print_stats_every: int = 0,
        introspect_every: int = 0,
        introspect_dir: str = "results/introspect",
        fetch_every: int = 1,
        mesh=None,
        dtype=jnp.float32,
    ):
        self.cam = cam
        self.dtype = dtype
        self.frontend = FeatureTrackerFrontend(cam, tracker_cfg, dtype=dtype)
        self.line_frontend = (
            LineTrackerFrontend(cam, line_cfg, dtype=dtype) if line_cfg else None
        )
        self.vio = VioEngine(
            window_cfg,
            imu_params or imu_mod.default_params(dtype),
            q_ic=q_ic,
            p_ic=p_ic,
            dtype=dtype,
            use_lines=line_cfg is not None,
            estimate_extrinsic=estimate_extrinsic,
            estimate_td=estimate_td,
            mesh=mesh,
        )
        # attention feature selector (USE_FEATURE_SELECTOR=1 dispatch,
        # estimator_node.cpp:336-349): tracked features always pass; new
        # features compete for the remaining information budget
        from ..models import selector as sel_mod

        self.use_selector = use_feature_selector
        self.selector_cfg = selector_cfg or sel_mod.SelectorConfig()
        self.use_loop = use_loop_closure
        self.pg_cfg = pg_cfg
        self.db = pg_mod.empty_db(pg_cfg, dtype)
        # host mirrors of db.count / db.seq / keyframe stamps: reading them
        # from the device every keyframe costs a round-trip each
        # (tunnel-latency killer); stamps feed loop-edge evaluation artifacts
        self._db_count = 0
        self._db_seqs: list = []
        self._kf_times: list = []
        self.R_drift = np.eye(3)
        self.t_drift = np.zeros(3)
        self._pending_loops = 0
        # fast-relocalization in flight: (cur_kf_index, old_kf_index) whose
        # refined relative pose the next VIO step will deliver
        self._pending_relo = None
        # r03 pipelining: in-flight frames (device refs) + staged loop-closure
        # jobs + a dispatched-but-unfetched drift correction.  fetch_every=K
        # (r05) deepens the pipeline: K dispatched frames ride the device
        # queue and their packed outputs are fetched in ONE [K, 28] readback
        # — the tunnel round-trip amortizes K× (BENCH r04: one readback per
        # frame was 158 of the 168 ms host frame).  K>1 changes add_image's
        # return type to a LIST of SystemOutputs (possibly empty).
        self._fetch_every = max(1, int(fetch_every))
        self._pending: list = []
        self._lc_jobs: list = []
        self._drift_dev = None
        self._loop_closed_flag = False
        # multi-sequence bookkeeping (pose_graph.cpp sequence_cnt/sequence_loop;
        # seq 0 is reserved for a loaded prior map).  (R_base, t_base) is the
        # reference's w_r_vio/w_t_vio: the shift applied to every incoming
        # VIO pose of the current sequence after it was re-based onto the map.
        self.seq = 1
        self._rebased_seqs = set()
        self._gap_restart = stream_gap_restart
        self._last_img_t = None
        self.R_base = np.eye(3)
        self.t_base = np.zeros(3)
        self.fusion_cfg = fusion_cfg
        self.fusion = gf_mod.empty_fusion(fusion_cfg, dtype) if fusion_cfg else None
        self._gps_origin = None
        self._key = jax.random.PRNGKey(1)
        # keyframe throttling state (pose_graph_node.cpp SKIP_CNT/SKIP_DIS)
        self._kf_skip_count = 0
        self._last_kf_p = None
        # observability: stage timers + periodic printStatistics-style stream
        from ..utils.stats import Statistics

        self.stats = Statistics(print_every=print_stats_every)
        # introspection stream (visualization.cpp 18-publisher equivalent):
        # every N finished frames, snapshot the window (points/lines/frusta/
        # selection status) in ONE jitted program and record NPZ+JSONL
        self._introspect_every = introspect_every
        self._introspect_sink = None
        self._frame_counter = 0
        if introspect_every:
            from ..utils.introspect import IntrospectionSink

            self._introspect_sink = IntrospectionSink(introspect_dir)
        # every jitted program is built ONCE here; per-frame calls hit the
        # trace cache (zero retraces after warmup — trace_counts proves it)
        self._trace_counts: dict = {}
        self._build_jits()

    def _counted_jit(self, name, fn):
        """jax.jit whose Python body bumps a counter at TRACE time, so tests
        can assert zero retraces in the steady state."""

        def traced(*args, **kwargs):
            self._trace_counts[name] = self._trace_counts.get(name, 0) + 1
            return fn(*args, **kwargs)

        return jax.jit(traced)

    def _build_jits(self):
        pg_cfg = self.pg_cfg
        jit = self._counted_jit
        self._jit_pgo = jit("pgo", lambda db: pg_mod.optimize_4dof(db, pg_cfg))
        self._jit_drift = jit(
            "drift", lambda db: pg_mod.drift_correction(db, pg_cfg)
        )
        self._jit_rebase = jit(
            "rebase",
            lambda db, k, cand: pg_mod.rebase_sequence(db, pg_cfg, k, cand),
        )
        self._jit_record_loop = jit("record_loop", pg_mod.record_loop)
        self._jit_retrieve = jit(
            "retrieve",
            lambda db, sig, seq: pg_mod.retrieve_candidates(
                db, pg_cfg, sig, query_seq=seq
            ),
        )
        self._jit_add_kf = jit(
            "add_kf",
            lambda db, *a, **kw: pg_mod.add_keyframe(db, pg_cfg, *a, **kw),
        )
        self._jit_verify = jit(
            "verify",
            lambda db, cand, wdesc, w3d, wv, p, q, key, q_ic, p_ic: (
                pg_mod.verify_loop(
                    db, pg_cfg, cand, wdesc, w3d, wv, p, q, key,
                    q_ic=q_ic, p_ic=p_ic,
                )
            ),
        )
        lift = lambda xy: cam_mod.lift(self.cam, xy)
        self._jit_extract = jit(
            "extract_kf",
            lambda img, wxy, wvalid: pg_mod.extract_keyframe_features(
                img, lift, pg_cfg, window_xy=(wxy, wvalid)
            ),
        )
        self._jit_window_points = jit("window_points", self._window_points_impl)
        if self._introspect_every:
            from ..utils.introspect import window_snapshot

            wcfg = self.vio.cfg
            self._jit_snapshot = jit(
                "snapshot", lambda s, d: window_snapshot(s, d, wcfg)
            )
        if self.use_selector:
            self._jit_select = jit("select", self._select_impl)
        if self.fusion_cfg is not None:
            fusion_cfg = self.fusion_cfg
            self._jit_input_gps = jit("input_gps", gf_mod.input_gps)
            self._jit_fusion_opt = jit(
                "fusion_opt", lambda s: gf_mod.optimize(s, fusion_cfg)
            )
            self._jit_input_odom = jit(
                "input_odom",
                lambda s, p, q: gf_mod.input_odom(s, fusion_cfg, p, q),
            )

    # ------------------------------------------------------------------ API
    def add_imu(self, t, acc, gyr):
        self.vio.add_imu(t, acc, gyr)

    def add_gnss(self, t, lat, lon, alt, accuracy=1.0):
        if self.fusion is None:
            return
        if self._gps_origin is None:
            self._gps_origin = (lat, lon, alt)
        enu = gf_mod.geodetic_to_enu(lat, lon, alt, *self._gps_origin)
        self.fusion = self._jit_input_gps(
            self.fusion, enu, jnp.asarray(accuracy, self.dtype)
        )
        self.fusion, _ = self._jit_fusion_opt(self.fusion)

    def new_sequence(self):
        """Start a new sequence after a stream discontinuity or reboot
        (pose_graph_node.cpp:69-111 + addKeyFrame sequence shift :47-62):
        the estimator restarts in its own fresh VIO frame; drift resets; the
        sequence re-attaches to the old map at its first inter-sequence loop.
        """
        self.seq += 1
        self.vio.reset()
        self.R_drift = np.eye(3)
        self.t_drift = np.zeros(3)
        self.R_base = np.eye(3)
        self.t_base = np.zeros(3)
        self._pending_relo = None
        self._pending = []
        self._lc_jobs.clear()
        self._drift_dev = None

    def load_map(self, path):
        """Load a prior keyframe map for multi-session relocalization
        (loadPoseGraph parity: loaded keyframes get sequence 0 and are held
        fixed in the 4-DoF PGO)."""
        db = pg_mod.load_db(path)
        self.db = db._replace(seq=jnp.zeros_like(db.seq))
        self._db_count = int(db.count)
        self._db_seqs = [0] * self._db_count
        self._kf_times = [float("nan")] * self._db_count

    def add_image(self, t, img):
        """Process one grayscale frame [H, W] in [0,1].

        PIPELINED (r03): the frame's front-end + VIO step are dispatched
        asynchronously and PREVIOUS frames' (already-computed) outputs are
        fetched and finished while the chip works.  With fetch_every=1 the
        return value is the previous frame's SystemOutput (or None) — the
        r03 contract.  With fetch_every=K>1, K dispatched frames ride the
        device queue and add_image returns a LIST of SystemOutputs (usually
        empty, K entries on fetch rounds): one [K, 28] readback per K frames
        amortizes the tunnel round-trip that dominated the r04 host loop.
        Call ``flush()`` at stream end for the tail.  Loop-closure work is
        staged one step per fetch round (extract/retrieve -> verify ->
        commit -> drift), mirroring the reference's asynchronous pose-graph
        process (pose_graph_node.cpp process/optimize4DoF threads)."""
        if (
            self._last_img_t is not None
            and t - self._last_img_t > self._gap_restart
        ):
            self.new_sequence()
        self._last_img_t = t
        img = jnp.asarray(img, self.dtype)
        tm = self.stats.timers
        listy = self._fetch_every > 1

        # ---- fetch phase: the queued frames' outputs + the one loop-stage
        # value due this round, in ONE device_get round, BEFORE any of this
        # frame's work is enqueued.  Fetch-after-dispatch (r02) queued the
        # readback behind frame k's compute on the device stream and paid
        # the whole pipeline depth per frame (122 ms median; docs/PERF.md).
        results = (
            self._drain_pending()
            if len(self._pending) >= self._fetch_every
            else []
        )

        # ---- dispatch phase: enqueue frame k's front-end + VIO step; the
        # chip works while the host returns to the caller
        with tm.time("frontend"):
            feats = self.frontend.process(t, img)
        ln_kwargs = {}
        if self.line_frontend is not None:
            with tm.time("line_frontend"):
                lines = self.line_frontend.process(t, img)
            ln_kwargs = dict(
                ln_ids=lines.ids, ln_obs=lines.endpoints,
                ln_vps=lines.vp_dirs, ln_vp_valid=lines.vp_valid,
            )
        ids, rays = feats.ids, feats.rays
        if self.use_selector and self.vio.initialized and len(self.vio._imu_acc) >= 2:
            acc_mean = jnp.asarray(
                np.mean(np.stack(self.vio._imu_acc), axis=0), self.dtype
            )
            gyr_mean = jnp.asarray(
                np.mean(np.stack(self.vio._imu_gyr), axis=0), self.dtype
            )
            dt = t - (self.vio.last_frame_time or t - 0.1)
            ids = self._jit_select(
                jnp.asarray(ids, jnp.int32), jnp.asarray(rays, self.dtype),
                self.vio.state, self.vio.data,
                acc_mean, gyr_mean, jnp.asarray(dt, self.dtype),
            )

        if not self.vio.initialized:
            out = self.vio.add_frame(t, ids, rays, **ln_kwargs)
            if out is not None and self.vio.initialized:
                # init just completed: out is host data; finish it now
                results.append(self._finish_frame(t, img, out))
            if listy:
                return results
            return results[0] if results else None

        with tm.time("vio_dispatch"):
            out_dev = self.vio.add_frame_async(t, ids, rays, packed=True,
                                               **ln_kwargs)
        self._pending.append(dict(
            t=t, img=img, out=out_dev,
            state=self.vio.state, data=self.vio.data,
        ))
        if listy:
            return results
        return results[0] if results else None

    def _drain_pending(self):
        """Fetch every queued frame output in ONE readback ([K, 28] stack +
        the due loop-stage value), run host bookkeeping for each in order,
        then advance the staged loop-closure pipeline by one step."""
        tm = self.stats.timers
        pending, self._pending = self._pending, []
        due_dev = self._lc_due_dev()
        due_h = None
        results = []
        with tm.time("fetch_finish"):
            stacked = jnp.stack([p["out"] for p in pending])
            out_mat, due_h = jax.device_get((stacked, due_dev))
        for i, p in enumerate(pending):
            out_h = unpack_output(out_mat[i])
            if out_h.failure:
                # the failed frame and every later in-flight one reboot
                # (failureDetection -> clearState parity, up to K frames
                # late); outputs after the failure were computed from the
                # corrupt state and are dropped
                self.vio.reset()
                self._lc_jobs.clear()
                due_h = None
                break
            results.append(
                self._finish_frame(
                    p["t"], p["img"], out_h, state=p["state"], data=p["data"]
                )
            )
        with tm.time("loop_stage"):
            self._advance_loop_stage(due_h, due_dev)
        return results

    def flush(self):
        """Finish all in-flight frames and drain staged loop-closure work
        (stream end).  Returns the finished SystemOutputs (fetch_every>1) or
        the last one / None (fetch_every==1, r03 contract)."""
        results = self._drain_pending() if self._pending else []
        guard = 0
        while (self._lc_jobs or self._drift_dev is not None) and guard < 64:
            self._advance_loop_stage()
            guard += 1
        if self._fetch_every > 1:
            return results
        return results[-1] if results else None

    def _finish_frame(self, t, img, out, state=None, data=None):
        """Host bookkeeping for a frame whose StepOutput is on the host."""
        loop_closed = False
        # consume refined relative pose from an in-flight relocalization
        # (relo_relative_pose -> updateKeyFrameLoop parity)
        if self._pending_relo is not None and bool(out.relo_valid):
            k_cur, k_old = self._pending_relo
            self.db = self._jit_record_loop(
                self.db, jnp.asarray(k_cur), jnp.asarray(k_old),
                jnp.asarray(out.relo_rel_t), jnp.asarray(out.relo_rel_yaw),
            )
            self._run_pgo()
            loop_closed = True
        self._pending_relo = None
        if self.use_loop and bool(out.is_keyframe) and self._kf_throttle(out):
            self._lc_jobs.append(dict(
                stage="extract", t=t, img=img, out=out,
                state=state if state is not None else self.vio.state,
                data=data if data is not None else self.vio.data,
            ))

        from ..utils.geometry import rot_to_quat

        p_vio = np.asarray(out.p)
        q_vio = np.asarray(out.q)
        # sequence base shift (w_r_vio/w_t_vio) then drift correction
        R_bd = self.R_drift @ self.R_base
        p_corr = R_bd @ p_vio + self.R_drift @ self.t_base + self.t_drift
        q_corr = np.asarray(
            quat_mul(rot_to_quat(jnp.asarray(R_bd, self.dtype)), out.q)
        )
        if self.fusion is not None:
            self.fusion = self._jit_input_odom(
                self.fusion,
                jnp.asarray(p_corr, self.dtype),
                jnp.asarray(q_corr, self.dtype),
            )
        loop_closed = loop_closed or self._loop_closed_flag
        self._loop_closed_flag = False
        self._frame_counter += 1
        if (
            self._introspect_sink is not None
            and self._frame_counter % self._introspect_every == 0
        ):
            self._introspect_sink.write(
                t,
                self._jit_snapshot(
                    state if state is not None else self.vio.state,
                    data if data is not None else self.vio.data,
                ),
            )
        cost = float(np.asarray(out.ba_cost)) if hasattr(out, "ba_cost") else float("nan")
        self.stats.update(
            p_corr, bool(out.is_keyframe), loop_closed, ba_cost=cost
        )
        self.stats.maybe_print(
            p_ic=self.vio.state.p_ic, q_ic=self.vio.state.q_ic,
            td=self.vio.td,
        )
        return SystemOutput(
            t=t, p_vio=p_vio, q_vio=q_vio, p_corrected=p_corr,
            q_corrected=q_corr, is_keyframe=bool(out.is_keyframe),
            loop_closed=loop_closed,
            timings=dict(self.stats.timers.last), ba_cost=cost,
        )

    # ------------------------------------------------------- loop closure
    def _kf_throttle(self, out) -> bool:
        """SKIP_CNT/SKIP_DIS keyframe throttling (pose_graph_node.cpp:294-336):
        pass every (skip_cnt+1)-th VIO keyframe that has moved skip_dis."""
        cfg = self.pg_cfg
        if cfg.skip_cnt > 0:
            self._kf_skip_count += 1
            if self._kf_skip_count <= cfg.skip_cnt:
                return False
        if cfg.skip_dis > 0.0 and self._last_kf_p is not None:
            if np.linalg.norm(np.asarray(out.p) - self._last_kf_p) < cfg.skip_dis:
                return False
        self._kf_skip_count = 0
        self._last_kf_p = np.asarray(out.p)
        return True

    def _lc_due_dev(self):
        """Device value the NEXT _advance_loop_stage call will read, if any —
        so add_image can fetch it in the SAME device_get round as the frame
        output (the tunnel round trip is 30-80 ms; two serial readbacks per
        frame were the bulk of the r02 host-loop latency)."""
        if self._drift_dev is not None:
            return self._drift_dev
        if self._lc_jobs:
            job = self._lc_jobs[0]
            if job["stage"] == "cand":
                return job["cand_dev"]
            if job["stage"] == "commit":
                return job["lr_dev"]
        return None

    def _advance_loop_stage(self, due_h=None, due_dev=None):
        """Advance the staged loop-closure pipeline by ONE step (≤1 small
        readback): extract/retrieve -> candidate check -> verify -> commit,
        plus the deferred drift fetch.  The frame path never blocks on the
        whole chain — the reference runs the same work in a separate
        pose-graph process (pose_graph_node.cpp:294, optimize4DoF:403).

        due_h: the host value of _lc_due_dev() if the caller prefetched it
        (add_image batches it with the frame readback); due_dev is the device
        handle it was fetched FROM.  _finish_frame may have changed which
        handle is due (e.g. the relo path dispatches a new PGO drift), so a
        prefetched value is consumed ONLY when the handle still matches —
        otherwise we fall back to a fresh device_get.
        """
        # deferred drift fetch from a previously dispatched 4-DoF solve
        if self._drift_dev is not None:
            if due_h is not None and due_dev is self._drift_dev:
                R_d, t_d = due_h
            else:
                R_d, t_d = jax.device_get(self._drift_dev)
            self.R_drift = np.asarray(R_d)
            self.t_drift = np.asarray(t_d)
            self._drift_dev = None
            return
        if not self._lc_jobs:
            return
        pre_stage = self._lc_jobs[0]["stage"]
        # promote extract-stage jobs first — extraction is DISPATCH-ONLY (no
        # readback), so the keyframe DB never lags the stream even when the
        # readback-limited cand/verify stages back up
        promoted = 0
        for job in self._lc_jobs:
            if job["stage"] == "extract" and promoted < 3:
                self._lc_stage_extract(job)
                promoted += 1
        # backlog control: past max_backlog, drop the OLDEST jobs still
        # waiting at the cand gate (their keyframes are already in the DB;
        # the reference's pose-graph process thread also discards backlog).
        # Job 0 is kept — its device value may be this drain's prefetch.
        cfg = self.pg_cfg
        if len(self._lc_jobs) > cfg.max_backlog:
            overflow = len(self._lc_jobs) - cfg.max_backlog
            keep = [self._lc_jobs[0]]
            for job in self._lc_jobs[1:]:
                if overflow > 0 and job["stage"] == "cand" and "cand_queue" not in job:
                    overflow -= 1
                    continue
                keep.append(job)
            self._lc_jobs = keep
        job = self._lc_jobs[0]
        # one readback stage per drain, only if the job was ALREADY at a
        # readback stage when the drain began (a just-promoted job's
        # retrieve is still computing; fetching it now would block)
        if pre_stage == "cand" and job["stage"] == "cand":
            self._lc_stage_cand(job, due_h if due_dev is job.get("cand_dev") else None)
        elif pre_stage == "commit" and job["stage"] == "commit":
            self._lc_stage_commit(job, due_h if due_dev is job.get("lr_dev") else None)
        if job.get("done"):
            self._lc_jobs.pop(0)

    def _lc_stage_extract(self, job):
        from ..utils.geometry import rot_to_quat

        # capacity guard: double the DB before it would overflow (JAX clamps
        # out-of-bounds .at[] writes silently, corrupting the last slot)
        if self._db_count >= self.db.p_vio.shape[0]:
            self.db = pg_mod.grow_db(self.db)
        out = job["out"]
        # window points: tracked features with solved depths -> world points
        w3d, wxy, w_valid, w_ids = self._jit_window_points(
            job["state"], job["data"]
        )
        fb = self._jit_extract(job["img"], wxy, w_valid)
        sig = fb["sig"]
        # keyframe pose and its world points in the sequence-based map frame
        Rb = jnp.asarray(self.R_base, self.dtype)
        tb = jnp.asarray(self.t_base, self.dtype)
        q_b = rot_to_quat(Rb)
        p_kf = Rb @ jnp.asarray(out.p) + tb
        q_kf = quat_mul(q_b, jnp.asarray(out.q))
        w3d = w3d @ Rb.T + tb
        self.db = self._jit_add_kf(
            self.db, p_kf, q_kf, sig,
            fb["desc"], fb["kp_norm"], fb["kp_valid"], fb["wdesc"], w3d, w_valid,
            seq=jnp.asarray(self.seq, jnp.int32),
        )
        job.update(
            stage="cand", k=self._db_count,
            cand_dev=self._jit_retrieve(
                self.db, sig, jnp.asarray(self.seq, jnp.int32)
            ),
            fb=fb, w3d=w3d, w_valid=w_valid, w_ids=w_ids,
            Rb=Rb, tb=tb, q_b=q_b, p_kf=p_kf, q_kf=q_kf,
        )
        self._db_count += 1
        self._db_seqs.append(self.seq)
        self._kf_times.append(float(job["t"]))

    def _lc_stage_cand(self, job, due_h=None):
        """Gate retrieval candidates and queue them for verification
        OLDEST-first (pose_graph.cpp detectLoop:374-383 min_index).  Gates
        (r5): the best non-recent candidate must clear BOTH the absolute
        floor (min_score) and the query's own recent-neighbor similarity
        floor (a revisit looks at least as similar as frames seconds away —
        detectLoop's minScore idea); every candidate within rel_margin of
        the best (the revisit plateau) is verification-eligible.  Unlike
        the reference, verification falls back to the next-oldest eligible
        candidate when PnP fails (the reference gives up for that
        keyframe)."""
        cfg = self.pg_cfg
        cand_i, cand_s, floor = (
            due_h if due_h is not None else jax.device_get(job["cand_dev"])
        )
        k = job["k"]
        best = float(cand_s[0])
        if best <= max(cfg.min_score, float(floor)):
            job["done"] = True
            return
        queue = []
        for i in range(len(cand_i)):
            cand, s = int(cand_i[i]), float(cand_s[i])
            if s < best - cfg.rel_margin:
                continue
            # candidates from other sequences/maps skip the recency check
            # (the exclusion zone only guards trivial same-trajectory hits)
            cross_seq = k > 0 and cand < len(self._db_seqs) and (
                self._db_seqs[cand] != self.seq
            )
            if k > cfg.skip_recent or cross_seq:
                queue.append((cand, cross_seq))
        if not queue:
            job["done"] = True
            return
        queue.sort()  # oldest keyframe first
        job["cand_queue"] = queue
        self._lc_dispatch_verify(job)

    def _lc_dispatch_verify(self, job):
        cand, cross_seq = job["cand_queue"].pop(0)
        self._key, key = jax.random.split(self._key)
        job.update(
            stage="commit", cand=cand, cross_seq=cross_seq,
            lr_dev=self._jit_verify(
                self.db, jnp.asarray(cand), job["fb"]["wdesc"], job["w3d"],
                job["w_valid"], job["p_kf"], job["q_kf"], key,
                self.vio.state.q_ic, self.vio.state.p_ic,
            ),
        )

    def _lc_stage_commit(self, job, due_h=None):
        lr = due_h if due_h is not None else jax.device_get(job["lr_dev"])
        if not bool(lr.ok):
            if job.get("cand_queue"):
                # verification failed: fall back to the next-oldest eligible
                # candidate (one verify per frame, staying in this stage)
                self._lc_dispatch_verify(job)
            else:
                job["done"] = True
            return
        job["done"] = True
        k, cand = job["k"], job["cand"]
        self.db = self._jit_record_loop(
            self.db, jnp.asarray(k), jnp.asarray(cand),
            jnp.asarray(lr.rel_t), jnp.asarray(lr.rel_yaw),
        )
        if job["cross_seq"] and self.seq not in self._rebased_seqs:
            # first loop onto an older sequence/map: re-base the whole
            # current sequence and fold the shift into the incoming
            # base transform (pose_graph.cpp:103-124 w_r_vio/w_t_vio)
            self.db, (R_s, t_s) = self._jit_rebase(
                self.db, jnp.asarray(k), jnp.asarray(cand)
            )
            R_s, t_s = np.asarray(R_s), np.asarray(t_s)
            self.R_base = R_s @ self.R_base
            self.t_base = R_s @ self.t_base + t_s
            self._rebased_seqs.add(self.seq)
        self._run_pgo()
        self._loop_closed_flag = True
        # arm fast-relocalization: matched old-keyframe observations
        # refine the loop's relative pose inside the next window BA;
        # the PnP seed pose is mapped back into the estimator's raw
        # VIO frame (undo the sequence base shift)
        mm = np.asarray(lr.match_mask)
        if mm.any():
            Rb_n = np.asarray(job["Rb"])
            tb_n = np.asarray(job["tb"])
            p_seed = Rb_n.T @ (np.asarray(lr.p_old) - tb_n)
            q_seed = quat_mul(quat_conj(job["q_b"]), jnp.asarray(lr.q_old))
            armed = self.vio.set_relo(
                np.asarray(job["w_ids"])[mm], np.asarray(lr.obs_old)[mm],
                p_seed, q_seed, kf_stamp=job["t"],
            )
            if armed:
                self._pending_relo = (k, cand)

    def _run_pgo(self):
        """Dispatch the 4-DoF pose-graph solve; the drift correction is
        fetched on a later frame (optimize4DoF runs on its own thread in the
        reference — drift lands asynchronously there too)."""
        self.db, _ = self._jit_pgo(self.db)
        self._drift_dev = self._jit_drift(self.db)

    def _select_impl(self, ids, rays, state, data, acc_mean, gyr_mean, dt):
        """Attention feature-selector dispatch (estimator_node.cpp:336-349 +
        feature_selector.cpp select:71-198): tracked features pass through;
        new features compete greedily for the remaining information budget
        over a propagated future horizon.  Returns ids with unselected new
        features masked to -1."""
        from ..models import selector as sel

        cfg = self.vio.cfg
        scfg = self.selector_cfg
        k = cfg.nf - 2  # newest solved frame after the slide

        tracked = jnp.isin(ids, jnp.where(data.pt_id >= 0, data.pt_id, -2))
        valid = ids >= 0
        is_new = valid & ~tracked

        # future horizon from the constant-IMU model (HorizonGenerator::imu)
        ps, qs, _ = sel.propagate_horizon(
            state.p[k], state.q[k], state.v[k], state.ba[k], state.bg[k],
            acc_mean, gyr_mean, dt, self.vio.params.g.astype(rays.dtype),
        )
        omega_prior = sel.imu_prior_information(
            qs, dt, scfg.acc_var, scfg.acc_bias_var, scfg.n_imu_per_frame
        )

        # depth guesses from the window's solved landmarks (findNNDepth)
        def known(slot):
            i = data.pt_start[slot]
            z = 1.0 / jnp.clip(data.pt_inv_depth[slot], 1e-4, 1e4)
            Xc_anchor = data.pt_obs[slot, i] * z
            # transform into camera k
            q_wc_i = quat_mul(state.q[i], state.q_ic)
            p_wc_i = state.p[i] + quat_rotate(state.q[i], state.p_ic)
            q_wc_k = quat_mul(state.q[k], state.q_ic)
            p_wc_k = state.p[k] + quat_rotate(state.q[k], state.p_ic)
            Xw = quat_rotate(q_wc_i, Xc_anchor) + p_wc_i
            Xc = quat_rotate(quat_conj(q_wc_k), Xw - p_wc_k)
            ok = data.pt_solved[slot] & (data.pt_id[slot] >= 0) & (Xc[2] > 0.1)
            return Xc / jnp.maximum(jnp.linalg.norm(Xc), 1e-9), Xc[2], ok

        k_rays, k_depths, k_ok = jax.vmap(known)(jnp.arange(cfg.max_points))
        unit = rays / jnp.maximum(
            jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-9
        )
        depths = sel.nn_depth_guess(unit, k_rays, k_depths, k_ok)

        omega_f = sel.feature_information(
            unit, depths, is_new, ps, qs, state.q_ic, state.p_ic,
            scfg.pix_sigma,
        )
        n_tracked = jnp.sum(tracked.astype(jnp.int32))
        budget = jnp.maximum(scfg.max_features - n_tracked, 0)
        selected, _ = sel.select_features(
            omega_prior, omega_f, is_new, budget, scfg
        )
        # pass-through when few candidates (init_threshold)
        n_cand = jnp.sum(valid.astype(jnp.int32))
        keep = jnp.where(
            n_cand <= scfg.init_threshold, valid, tracked | selected
        )
        return jnp.where(keep, ids, -1)

    def _window_points_impl(self, state, data):
        """World 3D points + pixel coords of currently solved tracks (the
        keyframe's PnP anchors — pubKeyframe parity)."""
        cfg = self.vio.cfg
        Wp = self.pg_cfg.n_window_pts

        q_wc = jax.vmap(lambda q: quat_mul(q, state.q_ic))(state.q)
        p_wc = state.p + jax.vmap(lambda q: quat_rotate(q, state.p_ic))(state.q)

        def one(slot):
            i = data.pt_start[slot]
            ray = data.pt_obs[slot, i]
            z = 1.0 / jnp.clip(data.pt_inv_depth[slot], 1e-4, 1e4)
            Xw = quat_rotate(q_wc[i], ray * z) + p_wc[i]
            # observation in the newest frame
            j = cfg.nf - 2
            seen = data.pt_mask[slot, j] & data.pt_solved[slot] & (data.pt_id[slot] >= 0)
            uv_n = data.pt_obs[slot, j, 0:2]
            return Xw, uv_n, seen

        Xw, uvn, seen = jax.vmap(one)(jnp.arange(cfg.max_points))
        # pixel coords for BRIEF extraction: project the MEASURED observation
        # ray (keyframe.cpp computeWindowBRIEFPoint describes at the tracked
        # point_2d_uv), NOT the estimated 3D — reprojecting the estimate
        # shifts the descriptor patch by the full VIO drift (tens of px) and
        # silently zeroed every loop verification (r5 root cause)
        from ..models.camera import project

        rays = jnp.concatenate([uvn, jnp.ones_like(uvn[:, :1])], axis=-1)
        uv_px, vis = project(self.cam, rays)
        seen = seen & vis
        # take the first Wp
        idx = jnp.argsort(~seen)[:Wp]
        return Xw[idx], uv_px[idx], seen[idx], data.pt_id[idx]
