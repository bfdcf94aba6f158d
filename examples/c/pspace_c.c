// P-space usage through the C ABI with the action callback — the analogue of
// the reference's Fortran P-space examples (LinearEigensystemExampleF-Pspace).
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include <string.h>
#include "iterative_solver_c.h"

#define N 10
#define NP 3
static double matrix[N][N];

static void action(const double* x, double* y, size_t nvec) {
  for (size_t v = 0; v < nvec; ++v)
    for (int i = 0; i < N; ++i) {
      double acc = 0;
      for (int j = 0; j < N; ++j) acc += matrix[i][j] * x[v*N + j];
      y[v*N + i] = acc;
    }
}

// callback: ADD the action of the P-space projection into contiguous rows.
// pcoeff is (update_size, NP); P vectors are unit vectors e_0..e_{NP-1}.
static void apply_on_p(const double* pcoeff, double* act, size_t update_size,
                       const size_t* ranges) {
  for (size_t v = 0; v < update_size; ++v) {
    size_t lo = ranges[2*v], hi = ranges[2*v+1];
    for (int p = 0; p < NP; ++p) {
      double c = pcoeff[v*NP + p];
      if (c == 0.0) continue;
      for (size_t i = lo; i < hi; ++i) act[v*(hi-lo) + (i-lo)] += c * matrix[i][p];
    }
  }
}

int main() {
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < N; ++j)
      matrix[i][j] = (i == j) ? (i + 1.0) : 0.05 / (1.0 + abs(i - j));
  size_t lo, hi;
  IterativeSolverLinearEigensystemInitialize(N, 1, &lo, &hi, 1e-9, 1e50, 1, 0, "", 0, "Davidson", "");
  double diag[N];
  for (int i = 0; i < N; ++i) diag[i] = matrix[i][i];
  IterativeSolverSetDiagonals(diag);

  // P space: unit vectors on the NP lowest diagonals
  size_t offsets[NP+1], indices[NP];
  double coeffs[NP], pp[NP*NP];
  for (int p = 0; p <= NP; ++p) offsets[p] = p;
  for (int p = 0; p < NP; ++p) { indices[p] = p; coeffs[p] = 1.0; }
  for (int p = 0; p < NP; ++p)
    for (int q = 0; q < NP; ++q) pp[p*NP + q] = matrix[p][q];

  double params[N] = {0}, act[N] = {0};
  size_t nwork = IterativeSolverAddP(1, NP, offsets, indices, coeffs, pp,
                                     params, act, 1, apply_on_p);
  while (IterativeSolverEndIterationNeeded()) {
    if (nwork > 0) {
      double ev[1];
      IterativeSolverWorkingSetEigenvalues(ev);
      for (int i = 0; i < N; ++i) act[i] /= (diag[i] - ev[0] + 1e-15);
    }
    nwork = IterativeSolverEndIteration(1, params, act, 1);
  }
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
  if (err[0] > 2e-9) { printf("FAIL\n"); return 1; }
  printf("P-space C ABI OK\n");
  return 0;
}
