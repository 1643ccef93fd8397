// Host-side measurement synchronizer: ring-buffered IMU/feature alignment.
//
// Native re-implementation of the reference's estimator_node.cpp buffering
// (imu_buf/feature_buf + getMeasurements:120-161: emit one frame packet
// containing all IMU samples up to the frame timestamp, interpolating the
// boundary sample), without ROS: a C API over fixed-capacity ring buffers,
// driven by any frontend thread and drained by the estimator thread.
//
// Built as libvplines_native.so; Python binds via ctypes
// (vplines_slam_tpu/native.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct ImuSample {
  double t;
  double acc[3];
  double gyr[3];
};

struct MeasurementSync {
  std::vector<ImuSample> imu;   // ring buffer
  size_t imu_head = 0;          // oldest
  size_t imu_count = 0;
  size_t cap;
  double last_frame_t = -1.0;
  double td = 0.0;              // camera-IMU time offset applied to frames
  std::mutex mu;

  explicit MeasurementSync(size_t capacity) : imu(capacity), cap(capacity) {}
};

}  // namespace

extern "C" {

int vpl_sync_drain_frame_partial(void* h, double frame_t, int allow_partial,
                                 int max_out, double* out_t, double* out_acc,
                                 double* out_gyr);

void* vpl_sync_create(int capacity) {
  return new MeasurementSync(static_cast<size_t>(capacity));
}

void vpl_sync_destroy(void* h) { delete static_cast<MeasurementSync*>(h); }

void vpl_sync_set_td(void* h, double td) {
  auto* s = static_cast<MeasurementSync*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  s->td = td;
}

// Push one IMU sample. Returns 0 on success, -1 if the buffer is full
// (oldest is overwritten; the caller may treat -1 as a warning).
int vpl_sync_push_imu(void* h, double t, const double* acc, const double* gyr) {
  auto* s = static_cast<MeasurementSync*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  size_t idx = (s->imu_head + s->imu_count) % s->cap;
  int rc = 0;
  if (s->imu_count == s->cap) {
    s->imu_head = (s->imu_head + 1) % s->cap;  // drop oldest
    s->imu_count--;
    rc = -1;
  }
  ImuSample& smp = s->imu[idx];
  smp.t = t;
  std::memcpy(smp.acc, acc, 3 * sizeof(double));
  std::memcpy(smp.gyr, gyr, 3 * sizeof(double));
  s->imu_count++;
  return rc;
}

int vpl_sync_imu_count(void* h) {
  auto* s = static_cast<MeasurementSync*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  return static_cast<int>(s->imu_count);
}

// Drain the interval (last_frame_t, frame_t + td]: writes up to max_out
// samples into out_t/out_acc/out_gyr, including one interpolated sample at
// exactly frame_t + td (the reference's boundary interpolation in
// getMeasurements / processIMU dt_1/dt_2 split). Consumed samples (strictly
// before the boundary) are popped; the boundary-straddling sample is kept
// for the next interval. Returns the number of samples written, or -1 if
// the newest IMU sample is still older than the frame (caller should wait).
int vpl_sync_drain_frame(void* h, double frame_t, int max_out, double* out_t,
                         double* out_acc, double* out_gyr) {
  return vpl_sync_drain_frame_partial(h, frame_t, 0, max_out, out_t, out_acc,
                                      out_gyr);
}

// allow_partial != 0: when the newest IMU sample is (even one float ULP)
// older than frame_t + td, clamp the boundary to the newest sample instead
// of refusing — the synchronous host loop cannot wait like the reference's
// condvar thread (estimator_node.cpp getMeasurements), and the sub-sample
// tail joins the next interval.
int vpl_sync_drain_frame_partial(void* h, double frame_t, int allow_partial,
                                 int max_out, double* out_t, double* out_acc,
                                 double* out_gyr) {
  auto* s = static_cast<MeasurementSync*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  double t_target = frame_t + s->td;
  if (s->imu_count == 0) return -1;
  const ImuSample& newest = s->imu[(s->imu_head + s->imu_count - 1) % s->cap];
  if (newest.t < t_target) {
    if (!allow_partial) return -1;  // not enough IMU yet
    t_target = newest.t;
  }

  int n = 0;
  ImuSample prev{};
  bool have_prev = false;
  while (s->imu_count > 0 && n < max_out) {
    const ImuSample& smp = s->imu[s->imu_head];
    if (smp.t >= t_target) break;
    out_t[n] = smp.t;
    std::memcpy(out_acc + 3 * n, smp.acc, 3 * sizeof(double));
    std::memcpy(out_gyr + 3 * n, smp.gyr, 3 * sizeof(double));
    prev = smp;
    have_prev = true;
    s->imu_head = (s->imu_head + 1) % s->cap;
    s->imu_count--;
    n++;
  }
  if (n >= max_out) return n;
  if (s->imu_count > 0) {
    // interpolate the boundary sample at t_target between prev and next
    const ImuSample& next = s->imu[s->imu_head];
    double w = 0.0;
    if (have_prev && next.t > prev.t) {
      w = (t_target - prev.t) / (next.t - prev.t);
    } else {
      prev = next;
      w = 0.0;
    }
    out_t[n] = t_target;
    for (int k = 0; k < 3; ++k) {
      out_acc[3 * n + k] = prev.acc[k] + w * (next.acc[k] - prev.acc[k]);
      out_gyr[3 * n + k] = prev.gyr[k] + w * (next.gyr[k] - prev.gyr[k]);
    }
    n++;
  }
  s->last_frame_t = frame_t;
  return n;
}

}  // extern "C"
