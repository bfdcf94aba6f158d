!> Symmetric A X = B through the linear-equations ABI leg. Twin of the
!> reference's LinearEquationsExampleF.F90 (RHS passed at initialize,
!> residual preconditioned with zero shift).
program linear_equations_f
  use iso_c_binding
  use iterative_solver
  implicit none
  integer, parameter :: n = 80, nrhs = 2
  double precision :: matrix(n, n), diag(n), rhs(n, nrhs)
  double precision :: params(n, nrhs), action(n, nrhs)
  double precision :: errors(nrhs), shifts(nrhs), resid
  integer(c_size_t) :: lo, hi, nwork
  integer(c_int) :: roots(nrhs)
  integer :: i, j, iter, v

  do j = 1, n
    do i = 1, n
      if (i == j) then
        matrix(i, j) = dble(i) + 1d0
      else
        matrix(i, j) = 0.01d0 / (1d0 + abs(i - j))
      end if
    end do
    diag(j) = matrix(j, j)
    do v = 1, nrhs
      rhs(j, v) = sin(dble(j * v))
    end do
  end do

  call IterativeSolverLinearEquationsInitialize( &
       int(n, c_size_t), int(nrhs, c_size_t), lo, hi, rhs, 0d0, 1d-10, 1d50, &
       1_c_int, 0_c_int, c_null_char, 0_c_int64_t, &
       'Davidson'//c_null_char, c_null_char)
  call IterativeSolverSetDiagonals(diag)

  params = 0d0
  do v = 1, nrhs
    params(v, v) = 1d0
  end do

  nwork = int(nrhs, c_size_t)
  do iter = 1, 100
    do v = 1, int(nwork)
      action(:, v) = matmul(matrix, params(:, v))
    end do
    nwork = IterativeSolverAddVector(nwork, params, action, 1_c_int)
    do while (IterativeSolverEndIterationNeeded() /= 0)
      if (nwork > 0) then
        do v = 1, int(nwork)
          action(:, v) = action(:, v) / (diag + 1d-15)
        end do
      end if
      nwork = IterativeSolverEndIteration(nwork, params, action, 1_c_int)
    end do
    if (nwork == 0) exit
  end do

  do v = 1, nrhs
    roots(v) = int(v - 1, c_int)
  end do
  call IterativeSolverSolution(int(nrhs, c_int), roots, params, action, 1_c_int)
  resid = 0d0
  do v = 1, nrhs
    resid = max(resid, maxval(abs(matmul(matrix, params(:, v)) - rhs(:, v))))
  end do
  call IterativeSolverErrors(errors)
  write (*, '(a, es10.2)') 'max |A x - b| =', resid
  call IterativeSolverFinalize()
end program linear_equations_f
