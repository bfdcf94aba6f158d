!> One-call Problem-class solve. Twin of the reference's
!> LinearEigensystemExampleF-problem.F90: a matrix_problem_t around the
!> ExampleProblem matrix, solved by problem_solve (the Fortran analogue of
!> Iterative_Solver_Solve, IterativeSolverF.F90:814).
program linear_eigensystem_problem_f
  use iso_c_binding
  use iterative_solver
  use iterative_solver_problem
  implicit none
  integer, parameter :: n = 100, nroot = 2
  double precision, target :: matrix(n, n)
  double precision :: params(n, nroot), actions(n, nroot), eigs(nroot)
  type(matrix_problem_t) :: prob
  logical :: converged
  integer :: i, j, v

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

  params = 0d0
  do v = 1, nroot
    params(v, v) = 1d0
  end do

  converged = problem_solve(prob, params, actions, nroot, 1d-9, &
                            max_iter=100, verbosity=1)
  if (.not. converged) stop 'solve did not converge'
  write (*, '(a)') 'problem-class eigensystem solve converged'
end program linear_eigensystem_problem_f
