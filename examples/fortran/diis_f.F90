!> DIIS solution of the trigonometric nonlinear system
!> r_i(x) = x_i - cos(sum_j x_j) / (i + 1). Twin of the reference's
!> DIISExampleF.F90 through the NonLinearEquations ABI leg.
program diis_f
  use iso_c_binding
  use iterative_solver
  implicit none
  integer, parameter :: n = 8
  double precision :: x(n), r(n), err(1), s
  integer(c_size_t) :: lo, hi, nwork
  integer :: i, iter

  call IterativeSolverNonLinearEquationsInitialize( &
       int(n, c_size_t), lo, hi, 1d-11, 0_c_int, c_null_char, &
       0_c_int64_t, 'DIIS'//c_null_char, c_null_char)

  x = 0d0
  do iter = 1, 100
    s = sum(x)
    do i = 1, n
      r(i) = x(i) - cos(s) / dble(i + 1)
    end do
    nwork = IterativeSolverAddVector(1_c_size_t, x, r, 1_c_int)
    do while (IterativeSolverEndIterationNeeded() /= 0)
      ! identity preconditioner: x <- x_interp - r_interp
      nwork = IterativeSolverEndIteration(1_c_size_t, x, r, 1_c_int)
    end do
    if (nwork == 0) exit
  end do

  call IterativeSolverErrors(err)
  write (*, '(a, es10.2)') 'residual norm ', err(1)
  call IterativeSolverFinalize()
end program diis_f
