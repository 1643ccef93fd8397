"""ctypes bindings for the native host runtime (libvplines_native.so).

The reference's host-side runtime is C++ (ROS nodes, estimator_node.cpp
buffering); the TPU build keeps the hot host paths native too:
- MeasurementSync: ring-buffered IMU/frame alignment with boundary-sample
  interpolation (estimator_node.cpp getMeasurements:120-161 semantics),
- TUM trajectory IO.

Falls back to pure Python when the library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "libvplines_native.so",
)

_lib = None


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vpl_sync_create.restype = ctypes.c_void_p
    lib.vpl_sync_create.argtypes = [ctypes.c_int]
    lib.vpl_sync_destroy.argtypes = [ctypes.c_void_p]
    lib.vpl_sync_set_td.argtypes = [ctypes.c_void_p, ctypes.c_double]
    dp = ctypes.POINTER(ctypes.c_double)
    lib.vpl_sync_push_imu.argtypes = [ctypes.c_void_p, ctypes.c_double, dp, dp]
    lib.vpl_sync_push_imu.restype = ctypes.c_int
    lib.vpl_sync_imu_count.argtypes = [ctypes.c_void_p]
    lib.vpl_sync_imu_count.restype = ctypes.c_int
    lib.vpl_sync_drain_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_int, dp, dp, dp,
    ]
    lib.vpl_sync_drain_frame.restype = ctypes.c_int
    lib.vpl_sync_drain_frame_partial.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_int, ctypes.c_int, dp, dp, dp,
    ]
    lib.vpl_sync_drain_frame_partial.restype = ctypes.c_int
    lib.vpl_write_tum.argtypes = [ctypes.c_char_p, dp, dp, dp, ctypes.c_int]
    lib.vpl_write_tum.restype = ctypes.c_int
    lib.vpl_count_tum.argtypes = [ctypes.c_char_p]
    lib.vpl_count_tum.restype = ctypes.c_int
    lib.vpl_read_tum.argtypes = [ctypes.c_char_p, dp, dp, dp, ctypes.c_int]
    lib.vpl_read_tum.restype = ctypes.c_int
    _lib = lib
    return lib


def available():
    return load() is not None


def _as_dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class MeasurementSync:
    """Native IMU/frame synchronizer (falls back to Python if unbuilt)."""

    def __init__(self, capacity=4096):
        self._lib = load()
        self.capacity = capacity
        if self._lib:
            self._h = self._lib.vpl_sync_create(capacity)
        else:
            self._t, self._acc, self._gyr = [], [], []
            self._td = 0.0

    def __del__(self):
        if getattr(self, "_lib", None) and getattr(self, "_h", None):
            self._lib.vpl_sync_destroy(self._h)
            self._h = None

    def set_td(self, td):
        if self._lib:
            self._lib.vpl_sync_set_td(self._h, float(td))
        else:
            self._td = float(td)

    def push_imu(self, t, acc, gyr):
        acc = np.ascontiguousarray(acc, np.float64)
        gyr = np.ascontiguousarray(gyr, np.float64)
        if self._lib:
            return self._lib.vpl_sync_push_imu(self._h, float(t), _as_dp(acc), _as_dp(gyr))
        self._t.append(float(t))
        self._acc.append(acc)
        self._gyr.append(gyr)
        return 0

    def drain_frame(self, frame_t, max_out=1024, allow_partial=False):
        """All IMU samples in (prev_frame, frame_t+td], boundary interpolated.

        allow_partial clamps the boundary to the newest sample when IMU lags
        (synchronous host loops can't wait).  Returns (t [n], acc [n,3],
        gyr [n,3]) or None if IMU hasn't caught up (and not allow_partial).
        """
        if self._lib:
            t = np.empty(max_out, np.float64)
            acc = np.empty((max_out, 3), np.float64)
            gyr = np.empty((max_out, 3), np.float64)
            n = self._lib.vpl_sync_drain_frame_partial(
                self._h, float(frame_t), int(allow_partial), max_out,
                _as_dp(t), _as_dp(acc), _as_dp(gyr),
            )
            if n < 0:
                return None
            return t[:n], acc[:n], gyr[:n]
        # python fallback
        tt = frame_t + self._td
        if not self._t or self._t[-1] < tt:
            return None
        out_t, out_a, out_g = [], [], []
        while self._t and self._t[0] < tt:
            out_t.append(self._t.pop(0))
            out_a.append(self._acc.pop(0))
            out_g.append(self._gyr.pop(0))
        if self._t:
            if out_t and self._t[0] > out_t[-1]:
                w = (tt - out_t[-1]) / (self._t[0] - out_t[-1])
            else:
                w = 0.0
            prev_a = out_a[-1] if out_a else self._acc[0]
            prev_g = out_g[-1] if out_g else self._gyr[0]
            out_t.append(tt)
            out_a.append(prev_a + w * (self._acc[0] - prev_a))
            out_g.append(prev_g + w * (self._gyr[0] - prev_g))
        return np.asarray(out_t), np.stack(out_a), np.stack(out_g)


def write_tum(path, t, p, q_wxyz):
    lib = load()
    t = np.ascontiguousarray(t, np.float64)
    p = np.ascontiguousarray(p, np.float64)
    q = np.ascontiguousarray(q_wxyz, np.float64)
    if lib:
        return lib.vpl_write_tum(path.encode(), _as_dp(t), _as_dp(p), _as_dp(q), len(t))
    from .utils.evaluation import save_tum

    save_tum(path, t, p, q)
    return len(t)


def read_tum(path):
    lib = load()
    if lib:
        n = lib.vpl_count_tum(path.encode())
        if n < 0:
            raise FileNotFoundError(path)
        t = np.empty(n, np.float64)
        p = np.empty((n, 3), np.float64)
        q = np.empty((n, 4), np.float64)
        lib.vpl_read_tum(path.encode(), _as_dp(t), _as_dp(p), _as_dp(q), n)
        return t, p, q
    from .utils.evaluation import load_tum

    return load_tum(path)
