!> Timing driver for the eigensystem path. Twin of the reference's
!> LinearEigensystemBenchmarkF.F90: sweep dimension x nroot, time the full
!> solve loop with system_clock, print wall seconds, iterations and the
!> effective action throughput, then the solver's own statistics.
program benchmark_f
  use iso_c_binding
  use iterative_solver
  implicit none
  integer, parameter :: ncases = 3
  integer :: dims(ncases) = [100, 400, 1000]
  integer :: roots(ncases) = [1, 2, 4]
  integer :: c

  do c = 1, ncases
    call bench_case(dims(c), roots(c))
  end do

contains

  subroutine bench_case(n, nroot)
    integer, intent(in) :: n, nroot
    double precision, allocatable :: matrix(:, :), diag(:)
    double precision, allocatable :: params(:, :), action(:, :), shifts(:)
    double precision :: rate
    integer(c_size_t) :: lo, hi, nwork
    integer(c_int64_t) :: t0, t1, hz
    integer :: i, j, iter, v, matvecs

    allocate(matrix(n, n), diag(n), params(n, nroot), action(n, nroot), &
             shifts(nroot))
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
         int(n, c_size_t), int(nroot, c_size_t), lo, hi, 1d-8, 1d50, &
         1_c_int, 0_c_int, c_null_char, 0_c_int64_t, &
         'Davidson'//c_null_char, c_null_char)
    call IterativeSolverSetDiagonals(diag)

    params = 0d0
    do v = 1, nroot
      params(v, v) = 1d0
    end do

    matvecs = 0
    call system_clock(t0, hz)
    nwork = int(nroot, c_size_t)
    do iter = 1, 100
      do v = 1, int(nwork)
        action(:, v) = matmul(matrix, params(:, v))
      end do
      matvecs = matvecs + int(nwork)
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
    call system_clock(t1)

    rate = 2d0 * dble(matvecs) * dble(n) * dble(n) &
           / (dble(t1 - t0) / dble(hz)) / 1d9
    write (*, '(a, i6, a, i2, a, f8.3, a, i4, a, f8.2, a)') &
      'n=', n, ' roots=', nroot, '  wall ', dble(t1 - t0) / dble(hz), &
      ' s,  matvecs ', matvecs, ',  action ', rate, ' GFLOP/s'
    call IterativeSolverPrintStatistics()
    call IterativeSolverFinalize()
    deallocate(matrix, diag, params, action, shifts)
  end subroutine bench_case

end program benchmark_f
