!> L-BFGS minimisation of f(x) = 1/2 (x-b)^T H (x-b) through the
!> AddValue / End_Iteration ABI loop. Twin of the reference's
!> OptimizeExampleF.F90.
program optimize_f
  use iso_c_binding
  use iterative_solver
  implicit none
  integer, parameter :: n = 50
  double precision :: h(n, n), b(n), x(n), g(n), d(n)
  double precision :: f, err(1)
  integer(c_size_t) :: lo, hi, nwork
  integer :: i, j, iter

  do j = 1, n
    do i = 1, n
      if (i == j) then
        h(i, j) = dble(i) + 1d0
      else
        h(i, j) = 0.02d0 / (1d0 + abs(i - j))
      end if
    end do
    b(j) = cos(dble(j))
  end do

  call IterativeSolverOptimizeInitialize( &
       int(n, c_size_t), lo, hi, 1d-10, 1d50, 0_c_int, 1_c_int, &
       c_null_char, 0_c_int64_t, 'BFGS'//c_null_char, c_null_char)

  x = 0d0
  do iter = 1, 200
    d = x - b
    g = matmul(h, d)
    f = 0.5d0 * dot_product(d, g)
    nwork = IterativeSolverAddValue(f, x, g, 1_c_int)
    do while (IterativeSolverEndIterationNeeded() /= 0)
      if (nwork > 0) then
        do i = 1, n
          g(i) = g(i) / (h(i, i) + 1d-15)
        end do
      end if
      nwork = IterativeSolverEndIteration(1_c_size_t, x, g, 1_c_int)
    end do
    if (nwork == 0) exit
  end do

  call IterativeSolverErrors(err)
  write (*, '(a, es10.2, a, es10.2)') &
    'gradient norm ', err(1), '  |x - b| ', maxval(abs(x - b))
  call IterativeSolverFinalize()
end program optimize_f
