!> Lowest eigenpairs of the ExampleProblem matrix through the raw ABI loop.
!> Twin of the reference's LinearEigensystemExampleF.F90: matrix
!> a(i,j) = i when i==j else 0.001*mod(i+j, n), 2 roots, manual
!> action / Add_Vector / precondition / End_Iteration driving.
program linear_eigensystem_f
  use iso_c_binding
  use iterative_solver
  implicit none
  integer, parameter :: n = 100, nroot = 2
  double precision :: matrix(n, n), diag(n)
  double precision :: params(n, nroot), action(n, nroot)
  double precision :: shifts(nroot), errors(nroot), eigs(nroot)
  integer(c_size_t) :: lo, hi, nwork
  integer :: i, j, iter, v

  do j = 1, n
    do i = 1, n
      if (i == j) then
        matrix(i, j) = dble(i)
      else
        matrix(i, j) = 0.001d0 * mod(i + j, n)
      end if
    end do
    diag(j) = matrix(j, j)
  end do

  call IterativeSolverLinearEigensystemInitialize( &
       int(n, c_size_t), int(nroot, c_size_t), lo, hi, 1d-9, 1d50, &
       1_c_int, 0_c_int, c_null_char, 0_c_int64_t, &
       'Davidson'//c_null_char, c_null_char)
  call IterativeSolverSetDiagonals(diag)

  ! unit-vector guesses on the smallest diagonals (1, 2, ... sorted already)
  params = 0d0
  do v = 1, nroot
    params(v, v) = 1d0
  end do

  nwork = int(nroot, c_size_t)
  do iter = 1, 100
    do v = 1, int(nwork)
      action(:, v) = matmul(matrix, params(:, v))
    end do
    nwork = IterativeSolverAddVector(nwork, params, action, 1_c_int)
    do while (IterativeSolverEndIterationNeeded() /= 0)
      if (nwork > 0) then
        call IterativeSolverWorkingSetEigenvalues(shifts)
        do v = 1, int(nwork)
          action(:, v) = action(:, v) / (diag - shifts(v) + 1d-15)
        end do
      end if
      nwork = IterativeSolverEndIteration(nwork, params, action, 1_c_int)
    end do
    if (nwork == 0) exit
  end do

  call IterativeSolverEigenvalues(eigs)
  call IterativeSolverErrors(errors)
  write (*, '(a, 2f18.12)') 'eigenvalues', eigs
  write (*, '(a, 2es10.2)') 'errors     ', errors
  call IterativeSolverPrintStatistics()
  call IterativeSolverFinalize()
end program linear_eigensystem_f
