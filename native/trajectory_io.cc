// Fast trajectory file IO (TUM format) — native counterpart of the
// reference's trajectory sinks (estimator output_path, pose_graph loop path,
// global_fusion relust/*.txt writers).

#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {

// Write N poses in TUM format: t x y z qx qy qz qw.
// q is wxyz in memory (matching the Python convention); reordered on write.
int vpl_write_tum(const char* path, const double* t, const double* p,
                  const double* q_wxyz, int n) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  for (int i = 0; i < n; ++i) {
    std::fprintf(f, "%.9f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n", t[i],
                 p[3 * i], p[3 * i + 1], p[3 * i + 2], q_wxyz[4 * i + 1],
                 q_wxyz[4 * i + 2], q_wxyz[4 * i + 3], q_wxyz[4 * i]);
  }
  std::fclose(f);
  return n;
}

// Count lines, then parse t/p/q from a TUM file. Two-phase API:
// vpl_count_tum returns the row count; vpl_read_tum fills caller buffers.
int vpl_count_tum(const char* path) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  int n = 0;
  double a, b, c, d, e, g, h, k;
  while (std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %lf", &a, &b, &c, &d, &e,
                     &g, &h, &k) == 8) {
    n++;
  }
  std::fclose(f);
  return n;
}

int vpl_read_tum(const char* path, double* t, double* p, double* q_wxyz,
                 int max_n) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  int n = 0;
  double ti, x, y, z, qx, qy, qz, qw;
  while (n < max_n && std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %lf", &ti,
                                  &x, &y, &z, &qx, &qy, &qz, &qw) == 8) {
    t[n] = ti;
    p[3 * n] = x;
    p[3 * n + 1] = y;
    p[3 * n + 2] = z;
    q_wxyz[4 * n] = qw;
    q_wxyz[4 * n + 1] = qx;
    q_wxyz[4 * n + 2] = qy;
    q_wxyz[4 * n + 3] = qz;
    n++;
  }
  std::fclose(f);
  return n;
}

}  // extern "C"
