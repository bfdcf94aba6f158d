!> Fortran Problem class for the simplified one-call solver interface.
!>
!> Mirrors the reference's Iterative_Solver_Problem module
!> (Iterative_Solver_Problem.F90:7-22): an overridable Problem type carrying
!> the user callbacks (diagonals / precondition / residual / action / report)
!> plus a Matrix_Problem convenience wrapping a dense kernel, and a Solve
!> driver running the add_vector / end_iteration loop through the C ABI
!> declared in iterative_solver_f.F90. Source-level parity: no Fortran
!> compiler ships in this build image, so this module is validated by
!> inspection against the C ABI it calls (the same loop the compiled C
!> examples under examples/c/ exercise in CI).
module iterative_solver_problem
  use iso_c_binding
  use iterative_solver
  implicit none
  private

  type, public :: problem_t
  contains
    procedure, pass :: diagonals
    procedure, pass :: precondition
    procedure, pass :: residual
    procedure, pass :: action
    procedure, pass :: report
  end type problem_t

  type, public, extends(problem_t) :: matrix_problem_t
    double precision, pointer, dimension(:, :) :: matrix => null()
  contains
    procedure, pass :: diagonals => matrix_diagonals
    procedure, pass :: action => matrix_action
  end type matrix_problem_t

  public :: problem_solve
  public :: problem_solve_optimize

contains

  !> Optionally provide the diagonal elements of the kernel; returning
  !> .true. enables Jacobi preconditioning and diagonal-based guesses.
  logical function diagonals(this, d)
    class(problem_t), intent(in) :: this
    double precision, intent(inout), dimension(:) :: d
    diagonals = .false.
  end function diagonals

  logical function matrix_diagonals(this, d)
    class(matrix_problem_t), intent(in) :: this
    double precision, intent(inout), dimension(:) :: d
    integer :: i
    do i = 1, size(d)
      d(i) = this%matrix(i, i)
    end do
    matrix_diagonals = .true.
  end function matrix_diagonals

  !> Default Jacobi preconditioner: r_i / (d_i - shift + 1e-15) when
  !> diagonals are available, identity otherwise.
  subroutine precondition(this, action, shift, diag)
    class(problem_t), intent(in) :: this
    double precision, intent(inout), dimension(:, :) :: action
    double precision, intent(in), dimension(:), optional :: shift
    double precision, intent(in), dimension(:), optional :: diag
    integer :: v, i
    double precision :: s
    if (.not. present(diag)) return
    do v = 1, size(action, 2)
      s = 0d0
      if (present(shift)) s = shift(v)
      do i = 1, size(action, 1)
        action(i, v) = action(i, v) / (diag(i) - s + 1d-15)
      end do
    end do
  end subroutine precondition

  !> Nonlinear problems: residual r(x); returns the objective value.
  double precision function residual(this, parameters, resid)
    class(problem_t), intent(in) :: this
    double precision, intent(in), dimension(:) :: parameters
    double precision, intent(out), dimension(:) :: resid
    resid = 0d0
    residual = 0d0
  end function residual

  !> Linear problems: action = kernel . parameters, column per vector.
  subroutine action(this, parameters, act)
    class(problem_t), intent(in) :: this
    double precision, intent(in), dimension(:, :) :: parameters
    double precision, intent(out), dimension(:, :) :: act
    act = 0d0
  end subroutine action

  subroutine matrix_action(this, parameters, act)
    class(matrix_problem_t), intent(in) :: this
    double precision, intent(in), dimension(:, :) :: parameters
    double precision, intent(out), dimension(:, :) :: act
    integer :: v
    do v = 1, size(parameters, 2)
      act(:, v) = matmul(this%matrix, parameters(:, v))
    end do
  end subroutine matrix_action

  subroutine report(this, iteration, verbosity, errors)
    class(problem_t), intent(in) :: this
    integer, intent(in) :: iteration, verbosity
    double precision, intent(in), dimension(:) :: errors
    if (verbosity > 0) print '(a,i4,a,es12.4)', ' iteration ', iteration, &
         ' max|residual| ', maxval(errors)
  end subroutine report

  !> One-call driver for a linear eigensystem: the Fortran twin of the
  !> reference's Iterative_Solver_Solve (IterativeSolverF.F90:814) running
  !> the action / add_vector / precondition / end_iteration loop over the
  !> C ABI with the Problem callbacks.
  logical function problem_solve(prob, parameters, actions, nroot, thresh, &
                                 max_iter, verbosity)
    class(problem_t), intent(in) :: prob
    double precision, intent(inout), dimension(:, :) :: parameters
    double precision, intent(inout), dimension(:, :) :: actions
    integer, intent(in) :: nroot
    double precision, intent(in) :: thresh
    integer, intent(in), optional :: max_iter
    integer, intent(in), optional :: verbosity
    integer :: n, iters, iter, verb
    integer(c_size_t) :: nwork, lo, hi
    double precision, allocatable :: diag(:), shifts(:), errors(:)
    logical :: have_diag

    n = size(parameters, 1)
    iters = 100
    if (present(max_iter)) iters = max_iter
    verb = 0
    if (present(verbosity)) verb = verbosity

    call IterativeSolverLinearEigensystemInitialize( &
         int(n, c_size_t), int(nroot, c_size_t), lo, hi, thresh, 1d50, &
         1_c_int, int(verb, c_int), c_null_char, 0_c_int64_t, &
         'Davidson'//c_null_char, c_null_char)
    allocate(diag(n), shifts(nroot), errors(nroot))
    have_diag = prob%diagonals(diag)
    if (have_diag) call IterativeSolverSetDiagonals(diag)

    nwork = int(nroot, c_size_t)
    do iter = 1, iters
      call prob%action(parameters(:, 1:int(nwork)), actions(:, 1:int(nwork)))
      nwork = IterativeSolverAddVector(nwork, parameters, actions, 1_c_int)
      do while (IterativeSolverEndIterationNeeded() /= 0)
        if (nwork > 0) then
          call IterativeSolverWorkingSetEigenvalues(shifts)
          if (have_diag) then
            call prob%precondition(actions(:, 1:int(nwork)), &
                                   shifts(1:int(nwork)), diag)
          else
            call prob%precondition(actions(:, 1:int(nwork)), &
                                   shifts(1:int(nwork)))
          end if
        end if
        nwork = IterativeSolverEndIteration(nwork, parameters, actions, 1_c_int)
      end do
      call IterativeSolverErrors(errors)
      call prob%report(iter, verb, errors)
      if (nwork == 0) exit
    end do
    problem_solve = (nwork == 0)
    call IterativeSolverFinalize()
    deallocate(diag, shifts, errors)
  end function problem_solve

  !> One-call driver for minimisation: the nonlinear twin of problem_solve
  !> running residual (value + gradient) / AddValue / precondition /
  !> End_Iteration through the L-BFGS leg of the C ABI (the loop the
  !> reference's OptimizeExampleF-problem.F90 drives through Solve).
  logical function problem_solve_optimize(prob, parameters, actions, thresh, &
                                          max_iter, verbosity)
    class(problem_t), intent(in) :: prob
    double precision, intent(inout), dimension(:) :: parameters
    ! TARGET + CONTIGUOUS: the gradient is viewed as an (n, 1) block via a
    ! rank-remapping pointer below; without TARGET the pointer would be
    ! undefined on return from any helper, and rank remapping requires a
    ! simply contiguous target (a non-contiguous actual gets copy-in/out at
    ! THIS boundary, which is safe for intent(inout))
    double precision, intent(inout), target, contiguous, dimension(:) :: actions
    double precision, intent(in) :: thresh
    integer, intent(in), optional :: max_iter
    integer, intent(in), optional :: verbosity
    integer :: n, iters, iter, verb
    integer(c_size_t) :: nwork, lo, hi
    double precision :: f
    double precision, allocatable :: diag(:), errors(:)
    double precision :: noshift(1)
    double precision, pointer :: grad_block(:, :)
    logical :: have_diag

    n = size(parameters)
    iters = 100
    if (present(max_iter)) iters = max_iter
    verb = 0
    if (present(verbosity)) verb = verbosity

    call IterativeSolverOptimizeInitialize( &
         int(n, c_size_t), lo, hi, thresh, 1d50, int(verb, c_int), 1_c_int, &
         c_null_char, 0_c_int64_t, 'BFGS'//c_null_char, c_null_char)
    allocate(diag(n), errors(1))
    have_diag = prob%diagonals(diag)
    if (have_diag) call IterativeSolverSetDiagonals(diag)
    noshift = 0d0

    nwork = 1_c_size_t
    do iter = 1, iters
      f = prob%residual(parameters, actions)
      nwork = IterativeSolverAddValue(f, parameters, actions, 1_c_int)
      do while (IterativeSolverEndIterationNeeded() /= 0)
        if (nwork > 0) then
          ! view the single gradient as an (n, 1) block for precondition
          grad_block(1:n, 1:1) => actions
          if (have_diag) then
            call prob%precondition(grad_block, noshift, diag)
          else
            call prob%precondition(grad_block, noshift)
          end if
        end if
        nwork = IterativeSolverEndIteration(1_c_size_t, parameters, actions, 1_c_int)
      end do
      call IterativeSolverErrors(errors)
      call prob%report(iter, verb, errors)
      if (nwork == 0) exit
    end do
    problem_solve_optimize = (nwork == 0)
    call IterativeSolverFinalize()
    deallocate(diag, errors)
  end function problem_solve_optimize

end module iterative_solver_problem
