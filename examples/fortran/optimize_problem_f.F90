!> One-call Problem-class minimisation. Twin of the reference's
!> OptimizeExampleF-problem.F90: a problem_t subtype supplying
!> residual (objective value + gradient) and diagonals, minimised by
!> problem_solve_optimize through the L-BFGS C-ABI leg.
module quadratic_problem
  use iterative_solver_problem
  implicit none

  type, extends(problem_t) :: quadratic_t
    double precision, allocatable :: h(:, :), b(:)
  contains
    procedure, pass :: diagonals => quad_diagonals
    procedure, pass :: residual => quad_residual
  end type quadratic_t

contains

  logical function quad_diagonals(this, d)
    class(quadratic_t), intent(in) :: this
    double precision, intent(inout), dimension(:) :: d
    integer :: i
    do i = 1, size(d)
      d(i) = this%h(i, i)
    end do
    quad_diagonals = .true.
  end function quad_diagonals

  !> f(x) = 1/2 (x-b)^T H (x-b); gradient in resid
  double precision function quad_residual(this, parameters, resid)
    class(quadratic_t), intent(in) :: this
    double precision, intent(in), dimension(:) :: parameters
    double precision, intent(out), dimension(:) :: resid
    resid = matmul(this%h, parameters - this%b)
    quad_residual = 0.5d0 * dot_product(parameters - this%b, resid)
  end function quad_residual

end module quadratic_problem

program optimize_problem_f
  use quadratic_problem
  implicit none
  integer, parameter :: n = 40
  type(quadratic_t) :: prob
  double precision :: x(n), g(n)
  logical :: converged
  integer :: i, j

  allocate(prob%h(n, n), prob%b(n))
  do j = 1, n
    do i = 1, n
      if (i == j) then
        prob%h(i, j) = dble(i) + 2d0
      else
        prob%h(i, j) = 0.02d0 / (1d0 + abs(i - j))
      end if
    end do
    prob%b(j) = sin(dble(j))
  end do

  x = 0d0
  converged = problem_solve_optimize(prob, x, g, 1d-10, max_iter=200, &
                                     verbosity=1)
  if (.not. converged) stop 'optimization did not converge'
  write (*, '(a, es10.2)') 'max |x - b| ', maxval(abs(x - prob%b))
end program optimize_problem_f
