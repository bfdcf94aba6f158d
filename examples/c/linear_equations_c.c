// C consumer of the embedded library: Krylov linear equations A X = B
// (two right-hand sides) through the reference's IterativeSolverC ABI.
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include "iterative_solver_c.h"

#define N 8
#define NRHS 2
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
      matrix[i][j] = (i == j) ? (i + 4.0) : 0.05 * ((i + j) % N);
  // symmetrise
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < i; ++j)
      matrix[i][j] = matrix[j][i] = 0.5 * (matrix[i][j] + matrix[j][i]);

  double rhs[NRHS][N];
  for (int v = 0; v < NRHS; ++v)
    for (int i = 0; i < N; ++i)
      rhs[v][i] = (v == 0) ? 1.0 / (i + 1.0) : ((i % 2) ? 1.0 : -1.0);

  size_t lo, hi;
  IterativeSolverLinearEquationsInitialize(N, NRHS, &lo, &hi, &rhs[0][0], 0.0,
                                           1e-11, 1e50, 1, 0, "", 0,
                                           "Davidson", "");
  double diag[N];
  for (int i = 0; i < N; ++i) diag[i] = matrix[i][i];
  IterativeSolverSetDiagonals(diag);

  double params[NRHS][N], act[NRHS][N];
  for (int v = 0; v < NRHS; ++v)
    for (int i = 0; i < N; ++i) { params[v][i] = (i == v); act[v][i] = 0.0; }

  size_t nwork = NRHS;
  for (int iter = 0; iter < 60 && nwork > 0; ++iter) {
    action(&params[0][0], &act[0][0], nwork);
    nwork = IterativeSolverAddVector(nwork, &params[0][0], &act[0][0], 1);
    while (IterativeSolverEndIterationNeeded()) {
      if (nwork > 0)
        for (size_t v = 0; v < nwork; ++v)
          for (int i = 0; i < N; ++i)
            act[v][i] /= (diag[i] + 1e-15);
      nwork = IterativeSolverEndIteration(nwork, &params[0][0], &act[0][0], 1);
    }
  }

  int roots[NRHS] = {0, 1};
  double sol[NRHS][N], res[NRHS][N];
  IterativeSolverSolution(NRHS, roots, &sol[0][0], &res[0][0], 1);
  IterativeSolverFinalize();

  // verify A x = b directly
  double maxres = 0.0;
  for (int v = 0; v < NRHS; ++v)
    for (int i = 0; i < N; ++i) {
      double acc = 0;
      for (int j = 0; j < N; ++j) acc += matrix[i][j] * sol[v][j];
      double r = fabs(acc - rhs[v][i]);
      if (r > maxres) maxres = r;
    }
  printf("max |A x - b| = %.3e\n", maxres);
  if (maxres > 1e-8) { printf("FAIL\n"); return 1; }
  printf("OK\n");
  return 0;
}
