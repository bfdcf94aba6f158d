// C consumer of the embedded library: DIIS nonlinear equations through the
// IterativeSolverNonLinearEquationsInitialize leg of the ABI. Solves the
// quadratic system r(x) = H x - b + eps * (x.x) x = 0.
#include <stdio.h>
#include <math.h>
#include "iterative_solver_c.h"

#define N 6
static double hess[N][N];
static double rhsv[N];

static void residual(const double* x, double* r) {
  double xx = 0.0;
  for (int i = 0; i < N; ++i) xx += x[i] * x[i];
  for (int i = 0; i < N; ++i) {
    double acc = -rhsv[i] + 0.05 * xx * x[i];
    for (int j = 0; j < N; ++j) acc += hess[i][j] * x[j];
    r[i] = acc;
  }
}

int main() {
  for (int i = 0; i < N; ++i) {
    rhsv[i] = 0.3 * (i + 1);
    for (int j = 0; j < N; ++j) hess[i][j] = (i == j) ? (3.0 + i) : 0.1;
  }
  size_t lo, hi;
  IterativeSolverNonLinearEquationsInitialize(N, &lo, &hi, 1e-11, 0, "", 0,
                                              "DIIS", "");
  if (!IterativeSolverNonLinear()) { printf("FAIL: not nonlinear\n"); return 1; }
  double x[N] = {0}, r[N] = {0};
  double err[1] = {1.0};
  for (int iter = 0; iter < 100 && err[0] > 1e-11; ++iter) {
    residual(x, r);
    size_t nwork = IterativeSolverAddVector(1, x, r, 1);
    while (IterativeSolverEndIterationNeeded()) {
      if (nwork > 0)
        for (int i = 0; i < N; ++i) r[i] /= hess[i][i];
      nwork = IterativeSolverEndIteration(1, x, r, 1);
    }
    IterativeSolverErrors(err);
  }
  residual(x, r);
  double maxr = 0.0;
  for (int i = 0; i < N; ++i) if (fabs(r[i]) > maxr) maxr = fabs(r[i]);
  printf("max |r(x)| = %.3e\n", maxr);
  IterativeSolverFinalize();
  if (maxr > 1e-9) { printf("FAIL\n"); return 1; }
  printf("DIIS C ABI OK\n");
  return 0;
}
