!> P-space usage with the apply_on_p callback. Twin of the reference's
!> LinearEigensystemExampleF-Pspace.F90: register NP sparse P vectors (unit
!> vectors on the lowest diagonals) with their model hamiltonian, let the
!> solver work in the combined P+Q space, the callback adding the P-space
!> action contributions.
module pspace_callback
  use iso_c_binding
  implicit none
  integer, parameter :: n = 10, np = 3
  double precision :: matrix(n, n)
contains
  subroutine apply_on_p(pcoeff, act, update_size, ranges) bind(C)
    real(c_double), intent(in) :: pcoeff(*)
    real(c_double), intent(inout) :: act(*)
    integer(c_size_t), value :: update_size
    integer(c_size_t), intent(in) :: ranges(*)
    integer :: v, p, i
    do v = 1, int(update_size)
      do p = 1, np
        ! pcoeff is (update_size, np) row-major; P vector p is e_p
        do i = 1, n
          act((v - 1) * n + i) = act((v - 1) * n + i) &
            + pcoeff((v - 1) * np + p) * matrix(i, p)
        end do
      end do
    end do
  end subroutine apply_on_p
end module pspace_callback

program linear_eigensystem_pspace_f
  use iso_c_binding
  use iterative_solver
  use pspace_callback
  implicit none
  double precision :: diag(n), params(n), act(n)
  double precision :: ev(1), err(1), shifts(1)
  double precision :: coeffs(np), pp(np, np)
  integer(c_size_t) :: lo, hi, nwork, offsets(np + 1), indices(np)
  integer :: i, j, iter

  do j = 1, n
    do i = 1, n
      if (i == j) then
        matrix(i, j) = dble(i)
      else
        matrix(i, j) = 0.05d0 / (1d0 + abs(i - j))
      end if
    end do
    diag(j) = matrix(j, j)
  end do

  call IterativeSolverLinearEigensystemInitialize( &
       int(n, c_size_t), 1_c_size_t, lo, hi, 1d-9, 1d50, 1_c_int, 0_c_int, &
       c_null_char, 0_c_int64_t, 'Davidson'//c_null_char, c_null_char)
  call IterativeSolverSetDiagonals(diag)

  ! P space: unit vectors on the NP lowest diagonals, 0-based indices
  do i = 1, np + 1
    offsets(i) = int(i - 1, c_size_t)
  end do
  do i = 1, np
    indices(i) = int(i - 1, c_size_t)
    coeffs(i) = 1d0
    do j = 1, np
      pp(j, i) = matrix(j, i)   ! row-major (np, np) == symmetric here
    end do
  end do

  params = 0d0
  act = 0d0
  nwork = IterativeSolverAddP(1_c_size_t, int(np, c_size_t), offsets, indices, &
                              coeffs, pp, params, act, 1_c_int, &
                              c_funloc(apply_on_p))
  do while (IterativeSolverEndIterationNeeded() /= 0)
    if (nwork > 0) then
      call IterativeSolverWorkingSetEigenvalues(shifts)
      act = act / (diag - shifts(1) + 1d-15)
    end if
    nwork = IterativeSolverEndIteration(1_c_size_t, params, act, 1_c_int)
  end do

  do iter = 1, 50
    if (nwork == 0) exit
    act = matmul(matrix, params)
    nwork = IterativeSolverAddVector(nwork, params, act, 1_c_int)
    do while (IterativeSolverEndIterationNeeded() /= 0)
      if (nwork > 0) then
        call IterativeSolverWorkingSetEigenvalues(shifts)
        act = act / (diag - shifts(1) + 1d-15)
      end if
      nwork = IterativeSolverEndIteration(1_c_size_t, params, act, 1_c_int)
    end do
  end do

  call IterativeSolverEigenvalues(ev)
  call IterativeSolverErrors(err)
  write (*, '(a, f18.12, a, es10.2)') 'eigenvalue', ev(1), '  error', err(1)
  call IterativeSolverFinalize()
end program linear_eigensystem_pspace_f
