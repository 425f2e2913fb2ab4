// Native lattice (Ewald) correction table generation.
//
// C++ rebuild of the reference's host-side table computation
// (lattice_init, forcetree.c:3611-3800; sums ngravs.c:761-1232): the
// (EN+1)^3-point octant tables cost ~2e8 transcendental evaluations per
// force law — the one genuinely hot host-side computation in the framework.
// The reference parallelizes it over MPI ranks; here OpenMP threads.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline void octant_point(int en, int64_t n, double x[3]) {
  const int en1 = en + 1;
  const int i = static_cast<int>(n / (en1 * en1));
  const int j = static_cast<int>((n / en1) % en1);
  const int k = static_cast<int>(n % en1);
  x[0] = 0.5 * i / en;
  x[1] = 0.5 * j / en;
  x[2] = 0.5 * k / en;
}

}  // namespace

extern "C" {

// Newtonian Ewald correction: force[n][3], psi[n] over the octant grid.
// alpha = 2, n,h in [-4,4]^3 (ngravs.c:774, 1180).
void ewald_newton_tables(int en, double* force, double* psi) {
  const int64_t total = static_cast<int64_t>(en + 1) * (en + 1) * (en + 1);
  const double alpha = 2.0;
  const double sqrtpi = std::sqrt(M_PI);
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t n = 0; n < total; ++n) {
    double x[3];
    octant_point(en, n, x);
    const double r2c = x[0] * x[0] + x[1] * x[1] + x[2] * x[2];
    double f[3] = {0, 0, 0};
    double sum1 = 0, sum2 = 0;
    if (r2c > 0) {
      const double rc = std::sqrt(r2c);
      for (int d = 0; d < 3; ++d) f[d] = x[d] / (r2c * rc);
    }
    for (int n0 = -4; n0 <= 4; ++n0)
      for (int n1 = -4; n1 <= 4; ++n1)
        for (int n2 = -4; n2 <= 4; ++n2) {
          const double dx = x[0] - n0, dy = x[1] - n1, dz = x[2] - n2;
          double r = std::sqrt(dx * dx + dy * dy + dz * dz);
          if (r < 1e-30) r = 1e-30;
          const double val =
              std::erfc(alpha * r) +
              2 * alpha * r / sqrtpi * std::exp(-alpha * alpha * r * r);
          const double w = val / (r * r * r);
          f[0] -= dx * w;
          f[1] -= dy * w;
          f[2] -= dz * w;
          sum1 += std::erfc(alpha * r) / r;
        }
    for (int h0 = -4; h0 <= 4; ++h0)
      for (int h1 = -4; h1 <= 4; ++h1)
        for (int h2 = -4; h2 <= 4; ++h2) {
          const int h2n = h0 * h0 + h1 * h1 + h2 * h2;
          if (h2n == 0) continue;
          const double hdotx = x[0] * h0 + x[1] * h1 + x[2] * h2;
          const double damp =
              std::exp(-M_PI * M_PI * h2n / (alpha * alpha));
          const double val =
              2.0 / h2n * damp * std::sin(2 * M_PI * hdotx);
          f[0] -= h0 * val;
          f[1] -= h1 * val;
          f[2] -= h2 * val;
          sum2 += 1.0 / (M_PI * h2n) * damp * std::cos(2 * M_PI * hdotx);
        }
    if (r2c <= 0) f[0] = f[1] = f[2] = 0;
    const double rc = std::sqrt(r2c > 0 ? r2c : 1e-60);
    psi[n] = M_PI / (alpha * alpha) - sum1 - sum2 + 1.0 / (rc < 1e-30 ? 1e-30 : rc);
    force[3 * n + 0] = f[0];
    force[3 * n + 1] = f[1];
    force[3 * n + 2] = f[2];
  }
}

// Screened-Yukawa (Salin & Caillol) correction: alpha = 5.64, [-5,5]^3
// (ngravs.c:968, 1028).  ym is dimensionless per box length.
void yukawa_lattice_tables(int en, double ym, double* force, double* psi) {
  const int64_t total = static_cast<int64_t>(en + 1) * (en + 1) * (en + 1);
  const double alpha = 5.64;
  const double sqrtpi = std::sqrt(M_PI);
  const double ymk = ym / (2 * M_PI);
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t n = 0; n < total; ++n) {
    double x[3];
    octant_point(en, n, x);
    const double r2c = x[0] * x[0] + x[1] * x[1] + x[2] * x[2];
    double f[3] = {0, 0, 0};
    double sum1 = 0, sum2 = 0;
    if (r2c > 0) {
      const double rc = std::sqrt(r2c);
      const double w = std::exp(-rc * ym) * (ym + 1.0 / rc) / r2c;
      for (int d = 0; d < 3; ++d) f[d] = x[d] * w;
    }
    for (int n0 = -5; n0 <= 5; ++n0)
      for (int n1 = -5; n1 <= 5; ++n1)
        for (int n2 = -5; n2 <= 5; ++n2) {
          const double dx = x[0] - n0, dy = x[1] - n1, dz = x[2] - n2;
          double r = std::sqrt(dx * dx + dy * dy + dz * dz);
          if (r < 1e-30) r = 1e-30;
          const double ep =
              std::exp(ym * r) * std::erfc(alpha * r + ym / (2 * alpha));
          const double en_ = std::exp(-ym * r) *
                             std::erfc(alpha * r - ym / (2 * alpha));
          double val = 0.5 * (ep + en_);
          double w = val / (r * r * r);
          f[0] -= dx * w;
          f[1] -= dy * w;
          f[2] -= dz * w;
          val = 0.5 * ym * (-ep + en_) +
                2 * alpha / sqrtpi *
                    std::exp(-alpha * alpha * r * r -
                             ym * ym / (4 * alpha * alpha));
          w = val / (r * r);
          f[0] -= dx * w;
          f[1] -= dy * w;
          f[2] -= dz * w;
          sum1 += ep / (2 * r) + en_ / (2 * r);
        }
    for (int h0 = -5; h0 <= 5; ++h0)
      for (int h1 = -5; h1 <= 5; ++h1)
        for (int h2 = -5; h2 <= 5; ++h2) {
          const int h2n = h0 * h0 + h1 * h1 + h2 * h2;
          if (h2n == 0) continue;
          const double hdotx = x[0] * h0 + x[1] * h1 + x[2] * h2;
          const double val =
              2 * std::exp(-M_PI * M_PI * (h2n + ymk * ymk) /
                           (alpha * alpha)) *
              std::sin(2 * M_PI * hdotx) / (h2n + ymk * ymk);
          f[0] -= h0 * val;
          f[1] -= h1 * val;
          f[2] -= h2 * val;
          sum2 += 1.0 /
                  (M_PI * h2n + ym * ym / (4 * M_PI)) *
                  std::exp(-M_PI * M_PI * h2n / (alpha * alpha) -
                           ym * ym / (4 * alpha * alpha)) *
                  std::cos(2 * M_PI * hdotx);
        }
    if (r2c <= 0) f[0] = f[1] = f[2] = 0;
    const double rc = std::sqrt(r2c > 0 ? r2c : 1e-60);
    psi[n] = M_PI / (alpha * alpha) - sum1 - sum2 +
             std::exp(-ym * (rc < 1e-30 ? 1e-30 : rc)) /
                 (rc < 1e-30 ? 1e-30 : rc);
    force[3 * n + 0] = f[0];
    force[3 * n + 1] = f[1];
    force[3 * n + 2] = f[2];
  }
}

}  // extern "C"
