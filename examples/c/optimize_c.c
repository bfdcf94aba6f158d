// C consumer of the embedded library: L-BFGS minimisation of a quadratic
// f(x) = 1/2 (x-b)^T H (x-b) through the AddValue/EndIteration ABI loop
// (the reference's IterativeSolverAddValue path, IterativeSolverC.h:31).
#include <stdio.h>
#include <math.h>
#include "iterative_solver_c.h"

#define N 10
static double hess[N][N];
static double target[N];

static double residual(const double* x, double* g) {
  // g = H (x - b); f = 1/2 (x-b)^T g
  double f = 0.0;
  for (int i = 0; i < N; ++i) {
    double acc = 0.0;
    for (int j = 0; j < N; ++j) acc += hess[i][j] * (x[j] - target[j]);
    g[i] = acc;
  }
  for (int i = 0; i < N; ++i) f += 0.5 * (x[i] - target[i]) * g[i];
  return f;
}

int main() {
  for (int i = 0; i < N; ++i) {
    target[i] = 0.1 * (i + 1);
    for (int j = 0; j < N; ++j)
      hess[i][j] = (i == j) ? (2.0 + i) : 0.1;
  }
  size_t lo, hi;
  IterativeSolverOptimizeInitialize(N, &lo, &hi, 1e-10, 1e50, 0, 1, "", 0,
                                    "BFGS", "");
  double x[N], g[N];
  for (int i = 0; i < N; ++i) { x[i] = 0.0; g[i] = 0.0; }

  double f = 0.0;
  for (int iter = 0; iter < 100; ++iter) {
    f = residual(x, g);
    size_t nwork = IterativeSolverAddValue(f, x, g, 1);
    while (IterativeSolverEndIterationNeeded()) {
      if (nwork > 0)
        for (int i = 0; i < N; ++i) g[i] /= hess[i][i];
      nwork = IterativeSolverEndIteration(1, x, g, 1);
    }
    double err[1];
    IterativeSolverErrors(err);
    if (err[0] < 1e-10) break;
  }
  if (!IterativeSolverHasValues()) { printf("FAIL: no values\n"); return 1; }
  double maxdev = 0.0;
  for (int i = 0; i < N; ++i) {
    double d = fabs(x[i] - target[i]);
    if (d > maxdev) maxdev = d;
  }
  printf("f = %.3e  max|x - x*| = %.3e  value-api %.3e\n",
         f, maxdev, IterativeSolverValue());
  if (maxdev > 1e-7) { printf("FAIL\n"); return 1; }
  printf("Optimize C ABI OK\n");
  return 0;
}
