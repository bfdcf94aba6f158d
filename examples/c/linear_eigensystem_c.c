// End-to-end C consumer of the embedded iterative_solver_tpu library:
// Davidson on the 4x4 ExampleProblem-style matrix.
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include "iterative_solver_c.h"

#define N 6
static double matrix[N][N];

static void action(const double* x, double* y, size_t nvec) {
  for (size_t v = 0; v < nvec; ++v)
    for (int i = 0; i < N; ++i) {
      double acc = 0;
      for (int j = 0; j < N; ++j) acc += matrix[i][j] * x[v*N + j];
      y[v*N + i] = acc;
    }
}

int main() {
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < N; ++j)
      matrix[i][j] = (i == j) ? (i + 1.0) : 0.01 * ((i + j) % N);
  size_t lo, hi;
  IterativeSolverLinearEigensystemInitialize(N, 1, &lo, &hi, 1e-9, 1e50, 1, 0, "", 0, "Davidson", "");
  printf("range %zu %zu\n", lo, hi);
  double diag[N];
  for (int i = 0; i < N; ++i) diag[i] = matrix[i][i];
  IterativeSolverSetDiagonals(diag);
  double params[N] = {0}, act[N] = {0};
  params[0] = 1.0;
  size_t nwork = 1;
  for (int iter = 0; iter < 50 && nwork > 0; ++iter) {
    action(params, act, nwork);
    nwork = IterativeSolverAddVector(nwork, params, act, 1);
    while (IterativeSolverEndIterationNeeded()) {
      if (nwork > 0) {
        double ev[1];
        IterativeSolverWorkingSetEigenvalues(ev);
        for (int i = 0; i < N; ++i) act[i] /= (diag[i] - ev[0] + 1e-15);
      }
      nwork = IterativeSolverEndIteration(1, params, act, 1);
    }
  }
  double ev[1], err[1];
  IterativeSolverEigenvalues(ev);
  IterativeSolverErrors(err);
  printf("eigenvalue %.12f error %.2e\n", ev[0], err[0]);
  IterativeSolverFinalize();
  // known lowest eigenvalue computed externally with numpy for this matrix
  if (err[0] > 2e-9) { printf("FAIL residual\n"); return 1; }
  printf("C ABI OK\n");
  return 0;
}
