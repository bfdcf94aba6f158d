!> Convenience-layer solve: the high-level Iterative_Solver_* surface
!> (iterative_solver_driver_f.F90) — optional arguments, allocatable
!> results, 1-based roots, and the one-call Solve driver on an instance
!> the caller pre-configures. Twin of the reference examples that drive
!> Iterative_Solver_Solve after Iterative_Solver_Linear_Eigensystem_
!> Initialize (IterativeSolverF.F90:78, :814).
program driver_convenience_f
  use iso_c_binding
  use iterative_solver_driver
  use iterative_solver_problem
  implicit none
  integer, parameter :: n = 80, nroot = 2
  double precision, target :: matrix(n, n)
  double precision :: params(n, nroot), actions(n, nroot)
  double precision, allocatable :: eigs(:), errs(:)
  type(matrix_problem_t) :: prob
  integer :: rng(2), i, j, np_sugg, pidx(4)
  logical :: converged

  do j = 1, n
    do i = 1, n
      if (i == j) then
        matrix(i, j) = dble(i)
      else
        matrix(i, j) = 0.001d0 * mod(i + j, n)
      end if
    end do
  end do
  prob%matrix => matrix

  ! optionals: only what differs from the defaults; range comes back
  ! 1-based inclusive
  call Iterative_Solver_Linear_Eigensystem_Initialize(n, nroot, &
       thresh=1d-9, verbosity=0, range=rng)
  if (rng(1) /= 1 .or. rng(2) /= n) stop 'unexpected local range'

  params = 0d0
  converged = Iterative_Solver_Solve(params, actions, prob, &
                                     generate_initial_guess=.true., &
                                     max_iter=100)
  if (.not. converged) stop 'driver solve did not converge'

  eigs = Iterative_Solver_Eigenvalues()   ! allocatable result
  errs = Iterative_Solver_Errors()
  write (*, '(a, 2f12.6)') 'eigenvalues  ', eigs
  write (*, '(a, 2es10.2)') 'errors       ', errs

  ! P-space suggestion off the converged solution (1-based indices)
  np_sugg = Iterative_Solver_Suggest_P(params, actions, pidx, &
                                       threshold=1d-12)
  write (*, '(a, i0, a, 4i5)') 'suggested ', np_sugg, ' P indices:', pidx

  call Iterative_Solver_Print_Statistics()
  call Iterative_Solver_Finalize()
  write (*, '(a)') 'convenience-layer solve converged'
end program driver_convenience_f
