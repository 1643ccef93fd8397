import os
import subprocess

import numpy as np
import pytest

from vplines_slam_tpu import native


@pytest.fixture(scope="module", autouse=True)
def build_native():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native")], check=True,
                   capture_output=True)
    yield


def test_sync_drain_with_interpolation():
    s = native.MeasurementSync(64)
    for k in range(20):
        s.push_imu(k * 0.005, np.array([0.1, 0.2, 9.8]), np.array([0.01, 0.02, 0.03]))
    out = s.drain_frame(0.033)
    assert out is not None
    t, acc, gyr = out
    assert abs(t[-1] - 0.033) < 1e-12  # boundary-interpolated sample
    assert t[0] == 0.0
    # second drain continues from the boundary
    t2, _, _ = s.drain_frame(0.051)
    assert t2[0] > 0.033 and abs(t2[-1] - 0.051) < 1e-12
    # not enough IMU yet
    assert s.drain_frame(10.0) is None


def test_sync_interpolated_values():
    s = native.MeasurementSync(64)
    # acc ramps linearly with time: interpolation must be exact
    for k in range(10):
        t = k * 0.01
        s.push_imu(t, np.array([t, 0.0, 0.0]), np.zeros(3))
    t, acc, _ = s.drain_frame(0.035)
    assert abs(acc[-1][0] - 0.035) < 1e-12


def test_tum_roundtrip(tmp_path):
    path = str(tmp_path / "traj.tum")
    t = np.array([1.5, 2.5, 3.5])
    p = np.arange(9, dtype=float).reshape(3, 3)
    q = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (3, 1))
    q[1] = [0.9, 0.1, 0.2, 0.3]
    native.write_tum(path, t, p, q)
    t2, p2, q2 = native.read_tum(path)
    np.testing.assert_allclose(t2, t, atol=1e-9)
    np.testing.assert_allclose(p2, p, atol=1e-6)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_ring_overflow_drops_oldest():
    s = native.MeasurementSync(8)
    for k in range(12):
        rc = s.push_imu(k * 1.0, np.zeros(3), np.zeros(3))
    assert rc == -1  # signalled overflow
    out = s.drain_frame(6.0)
    assert out is not None
    t, _, _ = out
    assert t[0] >= 4.0  # oldest dropped
