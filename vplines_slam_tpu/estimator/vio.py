"""The sliding-window VIO engine: host orchestration of jitted device stages.

Re-design of ``vins_estimator/src/estimator.cpp``'s state machine
(INITIAL -> NON_LINEAR, processIMU:82, processImage:121, solveOdometry:624,
failureDetection:902, slideWindow:1731) and ``estimator_node.cpp``'s
measurement alignment: three jitted programs (fill / init / track), each a
single XLA computation over fixed-shape device state.  The host only buffers
raw measurements between frames and branches on phase.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import imu as imu_mod
from ..utils.geometry import quat_mul, quat_rotate
from . import initializer as init_mod
from .slide import (
    ingest_frame,
    keyframe_parallax,
    marginalize_old,
    set_imu_interval,
    slide_window_new,
    slide_window_old,
)
from .window import (
    TrackData,
    WindowConfig,
    WindowState,
    empty_state,
    empty_tracks,
    reject_outliers,
    settle_lines,
    solve_window,
    triangulate_lines,
    triangulate_points,
)


class StepOutput(NamedTuple):
    p: jnp.ndarray  # latest body position
    q: jnp.ndarray  # latest body orientation
    v: jnp.ndarray
    ba: jnp.ndarray
    bg: jnp.ndarray
    is_keyframe: jnp.ndarray
    failure: jnp.ndarray
    ba_cost: jnp.ndarray
    # fast-relocalization feedback (estimator_node relo_relative_pose topic):
    # relative pose of the loop keyframe expressed in the optimized relo
    # (old keyframe) frame — valid when relo_valid
    relo_valid: jnp.ndarray = jnp.asarray(False)
    relo_rel_t: jnp.ndarray = jnp.zeros(3)
    relo_rel_q: jnp.ndarray = jnp.array([1.0, 0.0, 0.0, 0.0])
    relo_rel_yaw: jnp.ndarray = jnp.asarray(0.0)


def pack_output(out: StepOutput):
    """Flatten a StepOutput into ONE [28] f32 vector on device.  A pipelined
    host caller fetches this single array instead of a 12-leaf pytree — over
    a remote-TPU link every leaf can cost a round trip (docs/PERF.md)."""
    # always f32 (as documented above): under a bf16 engine, packing in the
    # state dtype would truncate ba_cost and the relo relative pose (~0.4%
    # rel.), degrading the loop-closure edge recorded via _finish_frame
    sc = lambda x: jnp.asarray(x, jnp.float32).reshape(-1)
    return jnp.concatenate([
        sc(out.p), sc(out.q), sc(out.v), sc(out.ba), sc(out.bg),
        sc(out.is_keyframe), sc(out.failure), sc(out.ba_cost),
        sc(out.relo_valid), sc(out.relo_rel_t), sc(out.relo_rel_q),
        sc(out.relo_rel_yaw),
    ])


def unpack_output(vec) -> StepOutput:
    """Host-side inverse of pack_output (numpy fields)."""
    import numpy as np

    v = np.asarray(vec)
    return StepOutput(
        p=v[0:3], q=v[3:7], v=v[7:10], ba=v[10:13], bg=v[13:16],
        is_keyframe=bool(v[16] > 0.5), failure=bool(v[17] > 0.5),
        ba_cost=float(v[18]),
        relo_valid=bool(v[19] > 0.5), relo_rel_t=v[20:23],
        relo_rel_q=v[23:27], relo_rel_yaw=float(v[27]),
    )


def _propagate_interval(state, cfg, dts, accs, gyrs, mask, params, k_from, k_to):
    """Seed the state of frame k_to by IMU propagation from k_from
    (estimator.cpp processIMU:82-120 world-frame propagation)."""
    g = params.g.astype(state.p.dtype)

    def step(carry, inp):
        p, q, v = carry
        dt, a0, g0, a1, g1, m = inp
        dt = dt * m
        p2, q2, v2 = imu_mod.midpoint_propagate(
            p, q, v, state.ba[k_from], state.bg[k_from], a0, g0, a1, g1, dt, g
        )
        return (p2, q2, v2), None

    init = (state.p[k_from], state.q[k_from], state.v[k_from])
    inputs = (dts, accs[:-1], gyrs[:-1], accs[1:], gyrs[1:], mask.astype(state.p.dtype))
    (p, q, v), _ = jax.lax.scan(step, init, inputs)
    return state._replace(
        p=state.p.at[k_to].set(p),
        q=state.q.at[k_to].set(q),
        v=state.v.at[k_to].set(v),
        ba=state.ba.at[k_to].set(state.ba[k_from]),
        bg=state.bg.at[k_to].set(state.bg[k_from]),
    )


def _failure_detection(state_old: WindowState, state_new: WindowState):
    """estimator.cpp failureDetection:902-948 thresholds."""
    big_ba = jnp.linalg.norm(state_new.ba[-1]) > 2.5
    big_bg = jnp.linalg.norm(state_new.bg[-1]) > 1.0
    jump = jnp.linalg.norm(state_new.p[-1] - state_old.p[-1]) > 5.0
    z_jump = jnp.abs(state_new.p[-1, 2] - state_old.p[-1, 2]) > 1.0
    return big_ba | big_bg | jump | z_jump



def track_step(state, data, pt_ids, pt_rays, ln_args, imu_batch, cfg, params,
               use_lines, solve_fn=None, t=None):
    """One steady-state VIO frame: IMU interval ingest + propagation, feature
    ingest, keyframe test, triangulation, window BA, outlier cull, and the
    keyframe/non-keyframe slide — ONE pure jittable program (the device body
    shared by VioEngine and the device-resident frame loop).

    solve_fn(state, data) -> (state, data, lm_out) overrides the window BA —
    the hook through which the DISTRIBUTED landmark-sharded solver
    (parallel/dist_ba.make_dist_ba_step) replaces the single-chip solve in
    the mapping/high-capacity product mode (VioEngine(mesh=...))."""
    nf = cfg.nf
    dts, accs, gyrs, mask, has_imu = imu_batch
    state0 = state
    data = set_imu_interval(
        data, nf - 2, dts, accs, gyrs, mask,
        ba=state.ba[nf - 2], bg=state.bg[nf - 2], params=params,
    )
    state = _propagate_interval(
        state, cfg, dts, accs, gyrs, mask, params, nf - 2, nf - 1
    )
    data = ingest_frame(data, cfg, nf - 1, pt_ids, pt_rays, *ln_args)
    # window frame stamps (relo_frame_local_index bookkeeping).  t=None
    # (profiling/dist-BA callers without real stamps): keep them monotone so
    # stamp matching stays well-defined; relo needs real stamps to fire.
    t_new = (
        data.frame_t[nf - 2] + 1.0 if t is None
        else jnp.asarray(t, data.frame_t.dtype)
    )
    data = data._replace(frame_t=data.frame_t.at[nf - 1].set(t_new))

    is_kf, parallax, n_new = keyframe_parallax(data, cfg, nf - 1)

    data = triangulate_points(state, data, cfg)
    if use_lines:
        data = triangulate_lines(state, data, cfg)
        # line-only Cauchy settle with poses fixed (onlyLineOpt,
        # estimator.cpp:950-1042) + the geometric line culls, so noisy fresh
        # triangulations never drag the joint solve
        data = settle_lines(state, data, cfg)
        data = reject_outliers(state, data, cfg, cull_points=False)
    if solve_fn is None:
        state, data, lm_out = solve_window(state, data, cfg, params)
    else:
        state, data, lm_out = solve_fn(state, data)
    data = reject_outliers(state, data, cfg)

    failure = _failure_detection(state0, state)

    # fast-relocalization feedback: refined relative pose between the loop
    # keyframe — located IN THE WINDOW BY ITS STAMP (relo_frame_local_index,
    # estimator.cpp setReloFrame:1848 + double2vector relo section) — and
    # the optimized relo pose.  The staged loop pipeline arms relo several
    # frames after the keyframe was newest, so a fixed slot is the WRONG
    # frame (r5: 45 deg of spurious yaw per refined edge).
    from ..utils.geometry import quat_conj, quat_to_rot, rot_to_ypr

    stamp_diff = jnp.abs(data.frame_t - data.relo_stamp)
    kf_idx = jnp.argmin(stamp_diff)
    relo_found = data.relo_valid & (stamp_diff[kf_idx] < 2e-3)
    rel_t = quat_rotate(
        quat_conj(state.q_relo), state.p[kf_idx] - state.p_relo
    )
    rel_q = quat_mul(quat_conj(state.q_relo), state.q[kf_idx])
    rel_yaw = (
        rot_to_ypr(quat_to_rot(state.q[kf_idx]))[0]
        - rot_to_ypr(quat_to_rot(state.q_relo))[0]
    )

    def do_kf(args):
        state, data = args
        prior = marginalize_old(state, data, cfg, params)
        return slide_window_old(state, data, cfg, params, prior)

    def do_non_kf(args):
        state, data = args
        return slide_window_new(state, data, cfg, params)

    out = StepOutput(
        p=state.p[nf - 1], q=state.q[nf - 1], v=state.v[nf - 1],
        ba=state.ba[nf - 1], bg=state.bg[nf - 1],
        is_keyframe=is_kf, failure=failure, ba_cost=lm_out.cost,
        relo_valid=relo_found,
        relo_rel_t=rel_t, relo_rel_q=rel_q, relo_rel_yaw=rel_yaw,
    )
    state, data = jax.lax.cond(is_kf, do_kf, do_non_kf, (state, data))
    return state, data, out


class VioEngine:
    """Host-facing monocular point(+line) VIO.

    Usage:
      eng = VioEngine(cfg, imu_params, q_ic, p_ic)
      eng.add_imu(t, acc, gyr)              # 100-1000 Hz
      out = eng.add_frame(t, ids, rays, ...)  # camera rate
    """

    def __init__(
        self,
        cfg: WindowConfig = WindowConfig(),
        params: Optional[imu_mod.ImuParams] = None,
        q_ic=None,
        p_ic=None,
        dtype=jnp.float64,
        use_lines: bool = False,
        seed: int = 0,
        estimate_extrinsic: Optional[int] = None,
        estimate_td: bool = False,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh with an 'f' axis — runs the
        window BA as the DISTRIBUTED landmark-sharded solver (psum-reduced
        camera system over ICI, parallel/dist_ba.py) instead of the
        single-chip solve.  The mapping/high-capacity product mode: pair
        with a large max_points config (configs/mapping_multichip.yaml);
        capacities must divide evenly over the mesh devices."""
        self.cfg = cfg
        self.dtype = dtype
        self.mesh = mesh
        self.params = params or imu_mod.default_params(dtype)
        self.use_lines = use_lines
        self.state = empty_state(cfg, dtype)
        if q_ic is not None:
            self.state = self.state._replace(
                q_ic=jnp.asarray(q_ic, dtype),
                p_ic=jnp.asarray(p_ic if p_ic is not None else jnp.zeros(3), dtype),
            )
        self.data = empty_tracks(cfg, dtype)
        self.frame_count = 0  # frames currently in the window (host)
        self.initialized = False
        self.last_frame_time = None
        # IMU buffering: the native ring-buffer synchronizer when built
        # (native/measurement_sync.cc — estimator_node.cpp getMeasurements
        # semantics incl. boundary interpolation), Python lists otherwise
        from .. import native as native_mod

        self._sync = native_mod.MeasurementSync() if native_mod.available() else None
        self._bound_sample = None  # previous boundary sample (native path)
        self._imu_times: list = []
        self._imu_acc: list = []
        self._imu_gyr: list = []
        self._key = jax.random.PRNGKey(seed)
        # extrinsic mode (parameters.h ESTIMATE_EXTRINSIC): 1 = given a
        # priori + refined in BA; 2 = unknown rotation, hand-eye during the
        # fill phase gates initialization (estimator.cpp:141-173)
        if estimate_extrinsic is None:
            estimate_extrinsic = 1 if q_ic is not None else 2
        self.estimate_extrinsic = estimate_extrinsic
        self.extrinsic_ok = estimate_extrinsic < 2
        # online temporal calibration (time_factor.cpp): estimated once from
        # the rotation-curve ICP, then applied as the measurement-alignment
        # shift (estimator_node.cpp:120-161 boundary = img_t + td)
        self.estimate_td = estimate_td
        self.td = 0.0
        self._td_solved = False
        from . import online_calib as oc_mod

        self._oc = oc_mod
        self._ex_acc = oc_mod.empty_extrinsic_calib(dtype=dtype)
        self._ex_prev = None
        self._ex_stable = 0
        self._td_acc = oc_mod.empty_td_calib(dtype=dtype) if estimate_td else None
        self._build_jits()

    # ------------------------------------------------------------------ jits
    def _build_jits(self):
        cfg, params = self.cfg, self.params

        def fill_step(state, data, frame_idx, pt_ids, pt_rays, ln_args,
                      imu_batch, t_stamp):
            dts, accs, gyrs, mask, has_imu = imu_batch
            data = jax.lax.cond(
                has_imu & (frame_idx > 0),
                lambda d: set_imu_interval(
                    d, frame_idx - 1, dts, accs, gyrs, mask,
                    ba=state.ba[frame_idx - 1], bg=state.bg[frame_idx - 1],
                    params=params,
                ),
                lambda d: d,
                data,
            )
            state = jax.lax.cond(
                has_imu & (frame_idx > 0),
                lambda s: _propagate_interval(
                    s, cfg, dts, accs, gyrs, mask, params, frame_idx - 1, frame_idx
                ),
                lambda s: s,
                state,
            )
            data = ingest_frame(data, cfg, frame_idx, pt_ids, pt_rays, *ln_args)
            data = data._replace(
                frame_t=data.frame_t.at[frame_idx].set(t_stamp)
            )
            return state, data

        self._fill_step = jax.jit(fill_step)

        def try_init(state, data, key):
            obs = data.pt_obs[:, :, 0:2]
            mask = data.pt_mask & (data.pt_id >= 0)[:, None]
            l, found = init_mod.choose_reference_frame(
                obs, mask, min_parallax=cfg.init_min_parallax,
                min_corres=cfg.init_min_corres,
            )
            # preintegrate all intervals at zero bias
            z3 = jnp.zeros(3, obs.dtype)
            pre = jax.vmap(
                lambda d, a, g, m: imu_mod.preintegrate(d, a, g, m, z3, z3, params)
            )(data.imu_dt, data.imu_acc, data.imu_gyr, data.imu_mask)
            sfm, _, _ = init_mod.window_sfm(obs, mask, l, key)
            out = init_mod.visual_inertial_align(
                sfm, pre, data.imu_valid, state.q_ic, state.p_ic, cfg.g_norm
            )
            ok = found & out.ok
            nf = cfg.nf
            state_new = state._replace(
                p=jnp.where(ok, out.p, state.p),
                q=jnp.where(ok, out.q, state.q),
                v=jnp.where(ok, out.v, state.v),
                bg=jnp.where(ok, jnp.broadcast_to(out.bg, (nf, 3)), state.bg),
                ba=jnp.where(ok, jnp.zeros_like(state.ba), state.ba),
            )
            # fresh triangulation at the aligned states (visualInitialAlign)
            data_new = data._replace(pt_solved=jnp.zeros_like(data.pt_solved))
            data_new = triangulate_points(state_new, data_new, cfg)
            # repropagate stored preintegrations at the estimated gyro bias
            from .slide import repropagate_all

            data_new = repropagate_all(data_new, state_new, params)
            return state_new, data_new, ok

        self._try_init = jax.jit(try_init)

        use_lines = self.use_lines
        if self.mesh is not None:
            from ..parallel import dist_ba

            # inside the outer jit the shard_map's in_specs drive the
            # partitioning (XLA reshards the replicated tables onto the 'f'
            # axis); explicit shard_tracks is only for eager callers
            solve_fn = dist_ba.make_dist_ba_step(self.mesh, cfg, params)
        else:
            solve_fn = None
        self._track_step = jax.jit(
            lambda s, d, i, r, l, b, t=None: track_step(
                s, d, i, r, l, b, cfg, params, use_lines, solve_fn=solve_fn,
                t=t,
            )
        )

        def init_finalize(state, data):
            """After a successful alignment: one full BA over the init window,
            then marginalize + slide (one compiled program, built once)."""
            state, data, lm_out = solve_window(state, data, cfg, params)
            prior = marginalize_old(state, data, cfg, params)
            state, data = slide_window_old(state, data, cfg, params, prior)
            return state, data, lm_out

        self._init_finalize = jax.jit(init_finalize)

        def init_drop_oldest(state, data):
            """Failed alignment: drop the oldest raw frame, keep collecting."""
            return slide_window_old(state, data, cfg, params, data.prior)

        self._init_drop_oldest = jax.jit(init_drop_oldest)

        from . import online_calib as oc_mod

        def pair_rot_newest(data, i, j, key):
            """Camera relative rotation between window frames i and j."""
            return oc_mod.pair_rotation(
                data.pt_obs[:, i], data.pt_obs[:, j],
                data.pt_mask[:, i], data.pt_mask[:, j], data.pt_id, key,
            )

        self._jit_pair_rot = jax.jit(pair_rot_newest)
        self._jit_push_pair = jax.jit(oc_mod.push_rotation_pair)
        self._jit_solve_ex = jax.jit(oc_mod.solve_extrinsic)
        self._jit_push_cam_angle = jax.jit(oc_mod.push_cam_angle)
        self._jit_push_imu_angles = jax.jit(oc_mod.push_imu_angles)
        self._jit_solve_td = jax.jit(oc_mod.solve_time_offset)

    # ------------------------------------------------------------- host API
    def add_imu(self, t, acc, gyr):
        if self._sync is not None:
            self._sync.push_imu(float(t), np.asarray(acc, float), np.asarray(gyr, float))
            # a small host mirror serves mean-IMU consumers (selector horizon)
            self._imu_acc.append(np.asarray(acc, float))
            self._imu_gyr.append(np.asarray(gyr, float))
            if len(self._imu_acc) > 64:
                self._imu_acc = self._imu_acc[-64:]
                self._imu_gyr = self._imu_gyr[-64:]
            return
        self._imu_times.append(float(t))
        self._imu_acc.append(np.asarray(acc, float))
        self._imu_gyr.append(np.asarray(gyr, float))

    def _pack_imu(self, frame_t=None):
        """Pad the buffered IMU batch since the previous frame to capacity.

        The measurement-alignment cut is frame_t + td (the reference's
        getMeasurements boundary, estimator_node.cpp:120-161).  Samples up to
        the boundary join this interval; when the boundary falls between two
        samples, a linearly-interpolated boundary sample is synthesized
        (estimator_node.cpp:200-216 send_imu interpolation) and seeds the
        next interval.  Uses the native ring-buffer synchronizer when built;
        frame_t=None consumes everything buffered (legacy/fallback)."""
        I = self.cfg.max_imu
        if self._sync is not None and frame_t is not None:
            self._sync.set_td(self.td)
            res = self._sync.drain_frame(float(frame_t), max_out=4 * I, allow_partial=True)
            dts = np.zeros(I)
            accs = np.zeros((I + 1, 3))
            gyrs = np.zeros((I + 1, 3))
            mask = np.zeros(I, bool)
            has = False
            if res is not None:
                bt, ba, bg_ = res
                if self._bound_sample is not None:
                    pt, pa, pg = self._bound_sample
                    if len(bt) == 0 or bt[0] > pt:
                        bt = np.concatenate([[pt], bt])
                        ba = np.concatenate([pa[None], ba])
                        bg_ = np.concatenate([pg[None], bg_])
                if len(bt) >= 2:
                    has = True
                    k = min(len(bt) - 1, I)
                    dts[:k] = np.diff(bt)[:k]
                    mask[:k] = True
                    accs[: k + 1] = ba[: k + 1]
                    gyrs[: k + 1] = bg_[: k + 1]
                    self._bound_sample = (bt[k], ba[k].copy(), bg_[k].copy())
                    if self._td_acc is not None and not self._td_solved:
                        ts_pad = np.zeros(I + 1)
                        ts_pad[: k + 1] = bt[: k + 1]
                        self._td_acc = self._jit_push_imu_angles(
                            self._td_acc,
                            jnp.asarray(ts_pad, self.dtype),
                            jnp.asarray(gyrs, self.dtype),
                            jnp.asarray(mask),
                        )
                elif len(bt) == 1:
                    self._bound_sample = (bt[0], ba[0].copy(), bg_[0].copy())
            d = self.dtype
            return (
                jnp.asarray(dts, d),
                jnp.asarray(accs, d),
                jnp.asarray(gyrs, d),
                jnp.asarray(mask),
                jnp.asarray(has),
            )

        t_boundary = None if frame_t is None else float(frame_t) + self.td
        ts_all = np.asarray(self._imu_times)
        acc_all = np.stack(self._imu_acc) if self._imu_acc else np.zeros((0, 3))
        gyr_all = np.stack(self._imu_gyr) if self._imu_gyr else np.zeros((0, 3))
        n_all = len(ts_all)
        if t_boundary is None or n_all == 0:
            j = n_all
        else:
            j = int(np.searchsorted(ts_all, t_boundary + 1e-9, side="right"))
        batch_t, batch_a, batch_g = ts_all[:j], acc_all[:j], gyr_all[:j]
        if (
            t_boundary is not None
            and 0 < j < n_all
            and ts_all[j] > t_boundary > ts_all[j - 1]
        ):
            # synthesize the exact boundary sample by linear interpolation
            w = (t_boundary - ts_all[j - 1]) / (ts_all[j] - ts_all[j - 1])
            bt = np.asarray([t_boundary])
            ba = (1 - w) * acc_all[j - 1 : j] + w * acc_all[j : j + 1]
            bg_ = (1 - w) * gyr_all[j - 1 : j] + w * gyr_all[j : j + 1]
            batch_t = np.concatenate([batch_t, bt])
            batch_a = np.concatenate([batch_a, ba])
            batch_g = np.concatenate([batch_g, bg_])

        n = len(batch_t)
        dts = np.zeros(I)
        accs = np.zeros((I + 1, 3))
        gyrs = np.zeros((I + 1, 3))
        mask = np.zeros(I, bool)
        has = n >= 2
        if has:
            k = min(n - 1, I)
            dts[:k] = np.diff(batch_t)[:k]
            mask[:k] = True
            accs[: k + 1] = batch_a[: k + 1]
            gyrs[: k + 1] = batch_g[: k + 1]
            # keep the boundary sample (+ any unconsumed future samples) for
            # the next interval
            self._imu_times = [batch_t[-1]] + list(ts_all[j:])
            self._imu_acc = [batch_a[-1]] + list(acc_all[j:])
            self._imu_gyr = [batch_g[-1]] + list(gyr_all[j:])
            if self._td_acc is not None and not self._td_solved:
                ts_pad = np.zeros(I + 1)
                ts_pad[: k + 1] = batch_t[: k + 1]
                self._td_acc = self._jit_push_imu_angles(
                    self._td_acc,
                    jnp.asarray(ts_pad, self.dtype),
                    jnp.asarray(gyrs, self.dtype),
                    jnp.asarray(mask),
                )
        d = self.dtype
        return (
            jnp.asarray(dts, d),
            jnp.asarray(accs, d),
            jnp.asarray(gyrs, d),
            jnp.asarray(mask),
            jnp.asarray(has),
        )

    def _pack_lines(self, ln_ids, ln_obs, ln_vps, ln_vp_valid):
        if not self.use_lines or ln_ids is None:
            return ()
        d = self.dtype
        vps = (
            jnp.asarray(ln_vps, d)
            if ln_vps is not None
            else jnp.zeros((len(ln_ids), 3), d).at[:, 2].set(1.0)
        )
        vpv = (
            jnp.asarray(ln_vp_valid)
            if ln_vp_valid is not None
            else jnp.zeros(len(ln_ids), bool)
        )
        return (jnp.asarray(ln_ids, jnp.int32), jnp.asarray(ln_obs, d), vps, vpv)

    def add_frame(
        self, t, pt_ids, pt_rays, ln_ids=None, ln_obs=None, ln_vps=None,
        ln_vp_valid=None,
    ):
        """Process one camera frame.  pt_ids [M] (pad -1), pt_rays [M, 3]."""
        cfg = self.cfg
        nf = cfg.nf
        # measurement alignment boundary = img_t + td (estimator_node.cpp
        # getMeasurements:120-161 with the online-calibrated time offset)
        imu_batch = self._pack_imu(float(t) + self.td)
        pt_ids = jnp.asarray(pt_ids, jnp.int32)
        pt_rays = jnp.asarray(pt_rays, self.dtype)
        ln_args = self._pack_lines(ln_ids, ln_obs, ln_vps, ln_vp_valid)
        self.last_frame_time = float(t)

        if not self.initialized:
            idx_int = self.frame_count
            idx = jnp.asarray(idx_int, jnp.int32)
            self.state, self.data = self._fill_step(
                self.state, self.data, idx, pt_ids, pt_rays, ln_args,
                imu_batch, jnp.asarray(float(t), self.dtype),
            )
            self.frame_count += 1
            self._online_calibration(t, idx_int)
            out = None
            if self.frame_count == nf:
                if (
                    self.estimate_extrinsic >= 2 and not self.extrinsic_ok
                ) or (self.estimate_td and not self._td_solved):
                    # calibration still converging: keep collecting frames
                    # (estimator.cpp INITIAL phase holds until ric/td ready)
                    self.state, self.data = self._init_drop_oldest(
                        self.state, self.data
                    )
                    self.frame_count = nf - 1
                    return None
                self._key, k = jax.random.split(self._key)
                state2, data2, ok = self._try_init(self.state, self.data, k)
                if bool(ok):
                    self.state, self.data, lm_out = self._init_finalize(
                        state2, data2
                    )
                    self.initialized = True
                    out = jax.device_get(
                        StepOutput(
                            p=self.state.p[nf - 2], q=self.state.q[nf - 2],
                            v=self.state.v[nf - 2], ba=self.state.ba[nf - 2],
                            bg=self.state.bg[nf - 2],
                            is_keyframe=jnp.asarray(True),
                            failure=jnp.asarray(False), ba_cost=lm_out.cost,
                        )
                    )
                    self.frame_count = nf - 1
                else:
                    # drop the oldest raw frame and keep collecting
                    self.state, self.data = self._init_drop_oldest(
                        self.state, self.data
                    )
                    self.frame_count = nf - 1
            return out

        self.state, self.data, out = self._track_step(
            self.state, self.data, pt_ids, pt_rays, ln_args, imu_batch,
            jnp.asarray(float(t), self.dtype),
        )
        # ONE host transfer for the whole step output: downstream consumers
        # (SlamSystem, sinks) read many fields; fetching them lazily costs a
        # device round-trip each — ruinous over a remote-TPU tunnel
        out = jax.device_get(out)
        if bool(out.failure):
            self.reset()
        return out

    def add_frame_async(
        self, t, pt_ids, pt_rays, ln_ids=None, ln_obs=None, ln_vps=None,
        ln_vp_valid=None, packed=False,
    ):
        """Steady-state frame step WITHOUT the host readback: dispatches the
        jitted step and returns the DEVICE StepOutput, so a pipelined caller
        (SlamSystem) can overlap this frame's compute with the previous
        frame's transfer + bookkeeping.  The caller owns failure handling
        (call ``reset()`` when the fetched output reports failure).  Falls
        back to the synchronous path until the filter is initialized."""
        if not self.initialized:
            return self.add_frame(
                t, pt_ids, pt_rays, ln_ids=ln_ids, ln_obs=ln_obs,
                ln_vps=ln_vps, ln_vp_valid=ln_vp_valid,
            )
        imu_batch = self._pack_imu(float(t) + self.td)
        pt_ids = jnp.asarray(pt_ids, jnp.int32)
        pt_rays = jnp.asarray(pt_rays, self.dtype)
        ln_args = self._pack_lines(ln_ids, ln_obs, ln_vps, ln_vp_valid)
        self.last_frame_time = float(t)
        self.state, self.data, out = self._track_step(
            self.state, self.data, pt_ids, pt_rays, ln_args, imu_batch,
            jnp.asarray(float(t), self.dtype),
        )
        if packed:
            if not hasattr(self, "_jit_pack_out"):
                self._jit_pack_out = jax.jit(pack_output)
            return self._jit_pack_out(out)
        return out

    def _online_calibration(self, t, idx_int):
        """Hand-eye extrinsic rotation (mode 2) + time-offset accumulation
        during the fill phase (estimator.cpp:141-173 hooks)."""
        need_ex = self.estimate_extrinsic >= 2 and not self.extrinsic_ok
        need_td = self.estimate_td and not self._td_solved
        if idx_int <= 0 or not (need_ex or need_td):
            return
        self._key, k2 = jax.random.split(self._key)
        q_cam, okp = self._jit_pair_rot(
            self.data, jnp.asarray(idx_int - 1), jnp.asarray(idx_int), k2
        )
        if need_ex:
            q_imu = self.data.imu_pre.delta_q[idx_int - 1]
            self._ex_acc = self._jit_push_pair(self._ex_acc, q_cam, q_imu, okp)
            q_ic, conv, _sigma = self._jit_solve_ex(self._ex_acc)
            # convergence: the reference's excitation gate (σ2 > 0.25,
            # initial_ex_rotation.cpp:66) OR estimate stability — successive
            # solves agreeing within 0.5 deg over 8 frames with enough pairs
            # (gentler motion than EuRoC never trips the raw σ gate)
            q_np = np.asarray(q_ic)
            if self._ex_prev is not None and int(self._ex_acc.count) >= 20:
                dot = min(1.0, abs(float(np.dot(q_np, self._ex_prev))))
                if np.degrees(2.0 * np.arccos(dot)) < 0.5:
                    self._ex_stable += 1
                else:
                    self._ex_stable = 0
            self._ex_prev = q_np
            if bool(conv) or self._ex_stable >= 8:
                self.state = self.state._replace(
                    q_ic=jnp.asarray(q_np, self.dtype)
                )
                self.extrinsic_ok = True
        if need_td:
            # gate visual pairs against the gyro increment: small-baseline
            # essential decompositions have heavy-tailed rotation errors that
            # would permanently skew the cumulative curve; the td signal in a
            # single pair (~td·dω) is orders below this 0.3 deg gate
            dq_imu = self.data.imu_pre.delta_q[idx_int - 1]
            ang_cam = 2.0 * jnp.arccos(jnp.clip(jnp.abs(q_cam[0]), 0.0, 1.0))
            ang_imu = 2.0 * jnp.arccos(jnp.clip(jnp.abs(dq_imu[0]), 0.0, 1.0))
            ok_td = okp & (jnp.abs(ang_cam - ang_imu) < 0.005)
            self._td_acc = self._jit_push_cam_angle(
                self._td_acc, jnp.asarray(float(t), self.dtype), q_cam,
                self.state.q_ic, ok_td, dq_imu,
            )
            if int(self._td_acc.n_cam) >= 60:
                td, _rms, okt = self._jit_solve_td(self._td_acc)
                if bool(okt):
                    self.td = float(td)
                    self._td_solved = True

    def set_relo(self, match_ids, match_obs, old_p, old_q, kf_stamp=None):
        """Arm fast-relocalization for the next solve (setReloFrame:1848).

        match_ids: [M] feature ids verified against an old keyframe;
        match_obs: [M, 2|3] their normalized observations in the OLD keyframe
        camera; old_p/old_q: the old keyframe's (VIO-frame) pose, seeding the
        6-dof relo pose that the next BA optimizes jointly with the window.
        kf_stamp: the LOOP keyframe's timestamp — the refined relative pose
        is extracted against the window frame matching this stamp
        (relo_frame_local_index); without it the refinement never reports
        valid (the loop edge keeps the PnP estimate).
        The refined relative pose comes back in StepOutput.relo_rel_*.
        """
        ids = np.asarray(match_ids, np.int64)
        obs = np.asarray(match_obs, float)
        if obs.shape[-1] == 2:
            obs = np.concatenate([obs, np.ones_like(obs[..., :1])], axis=-1)
        table = np.asarray(self.data.pt_id)
        P = table.shape[0]
        # np.asarray of a device array is a read-only view — copy to mutate
        relo_obs = np.array(self.data.relo_obs)
        relo_mask = np.zeros(P, bool)
        slot_of = {int(t): s for s, t in enumerate(table) if t >= 0}
        for m, fid in enumerate(ids):
            s = slot_of.get(int(fid))
            if s is not None:
                relo_obs[s] = obs[m]
                relo_mask[s] = True
        if not relo_mask.any():
            return False
        self.data = self.data._replace(
            relo_obs=jnp.asarray(relo_obs, self.dtype),
            relo_mask=jnp.asarray(relo_mask),
            relo_valid=jnp.asarray(True),
            relo_stamp=jnp.asarray(
                -2.0 if kf_stamp is None else float(kf_stamp), self.dtype
            ),
        )
        self.state = self.state._replace(
            p_relo=jnp.asarray(old_p, self.dtype),
            q_relo=jnp.asarray(old_q, self.dtype),
        )
        return True

    def reset(self):
        """Full reboot on failure (estimator clearState:reference)."""
        q_ic, p_ic = self.state.q_ic, self.state.p_ic
        self.state = empty_state(self.cfg, self.dtype)._replace(q_ic=q_ic, p_ic=p_ic)
        self.data = empty_tracks(self.cfg, self.dtype)
        self.frame_count = 0
        self.initialized = False
        self._imu_times, self._imu_acc, self._imu_gyr = [], [], []
