!> High-level Fortran convenience layer over the raw BIND(C) interfaces.
!>
!> The raw module (iterative_solver_f.F90) declares the C ABI verbatim;
!> THIS module carries the Fortran-side ergonomics the reference wrapper
!> module provides (IterativeSolverF.F90:78-1046): optional arguments with
!> defaults, character(len=*) -> NUL-terminated marshalling, logical <->
!> c_int conversion, shape-derived buffer sizes, 1-based root/index
!> conversion, ALLOCATABLE-result getters, and a one-call Solve driver
!> running a user problem_t against the ACTIVE solver instance.
!>
!> Conventions (documented, deliberately Fortran-natural):
!>  - vectors are COLUMNS: parameters/action are (n, nbuf) arrays;
!>  - roots and suggested P indices are 1-based on the Fortran side and
!>    converted to the C ABI's 0-based at the boundary;
!>  - ``range`` (optional, intent(out), dimension(2)) returns the local
!>    row range 1-based inclusive: [begin+1, end];
!>  - mpicomm arguments are accepted for source compatibility and ignored
!>    (the jax runtime replaces mpirun — the embedded library is
!>    single-process per rank).
!>
!> Shipped as source: this build image has no Fortran compiler, so the
!> module is validated by tests/test_fortran_abi.py (symbol closure vs the
!> raw module + .so exports, public-surface parity vs the reference
!> wrapper, balanced constructs).
module iterative_solver_driver
  use iso_c_binding
  use iterative_solver
  use iterative_solver_problem, only: problem_t
  implicit none
  private

  public :: Iterative_Solver_Linear_Eigensystem_Initialize
  public :: Iterative_Solver_Linear_Equations_Initialize
  public :: Iterative_Solver_DIIS_Initialize
  public :: Iterative_Solver_Optimize_Initialize
  public :: Iterative_Solver_Finalize
  public :: Iterative_Solver_Solve
  public :: Iterative_Solver_Add_Vector
  public :: Iterative_Solver_Add_Value
  public :: Iterative_Solver_End_Iteration
  public :: Iterative_Solver_End_Iteration_Needed
  public :: Iterative_Solver_Solution
  public :: Iterative_Solver_Add_P
  public :: Iterative_Solver_Suggest_P
  public :: Iterative_Solver_Errors
  public :: Iterative_Solver_Eigenvalues
  public :: Iterative_Solver_Working_Set_Eigenvalues
  public :: Iterative_Solver_Value
  public :: Iterative_Solver_Has_Values
  public :: Iterative_Solver_Has_Eigenvalues
  public :: Iterative_Solver_Non_Linear
  public :: Iterative_Solver_Verbosity
  public :: Iterative_Solver_Max_Iter
  public :: Iterative_Solver_Set_Max_Iter
  public :: Iterative_Solver_Set_Diagonals
  public :: Iterative_Solver_Diagonals
  public :: Iterative_Solver_Print_Statistics
  public :: mpicomm_compute, set_mpicomm_compute
  public :: mpicomm_global_f, mpicomm_self_f

  !> Dimensions of the ACTIVE (top-of-stack) instance, saved by the
  !> initializers for the allocatable-result getters and the Solve driver.
  !> Nested Initialize/Finalize pairs beyond one level keep only the
  !> newest dims — same single-active-instance ergonomics as the
  !> reference wrapper.
  integer, save :: active_n = 0
  integer, save :: active_nroot = 0
  integer(c_int64_t), save :: compute_comm = -1_c_int64_t

contains

  ! ------------------------------------------------------------------
  ! helpers
  ! ------------------------------------------------------------------

  !> logical -> C int (default .true. -> 1)
  pure integer(c_int) function l2i(flag, default)
    logical, intent(in), optional :: flag
    logical, intent(in) :: default
    logical :: f
    f = default
    if (present(flag)) f = flag
    l2i = merge(1_c_int, 0_c_int, f)
  end function l2i

  !> optional string -> trimmed copy with fallback (append c_null_char at
  !> the call site: `str_or(x, 'Davidson')//c_null_char`)
  function str_or(s, default) result(out)
    character(len=*), intent(in), optional :: s
    character(len=*), intent(in) :: default
    character(len=:), allocatable :: out
    if (present(s)) then
      out = trim(s)
    else
      out = trim(default)
    end if
  end function str_or

  subroutine store_range(lo, hi, range)
    integer(c_size_t), intent(in) :: lo, hi
    integer, intent(out), optional :: range(2)
    if (present(range)) then
      range(1) = int(lo) + 1   ! 1-based inclusive
      range(2) = int(hi)
    end if
  end subroutine store_range

  ! ------------------------------------------------------------------
  ! initializers
  ! ------------------------------------------------------------------

  subroutine Iterative_Solver_Linear_Eigensystem_Initialize(n, nroot, &
      thresh, thresh_value, hermitian, verbosity, pname, mpicomm, &
      algorithm, range, options)
    integer, intent(in) :: n, nroot
    double precision, intent(in), optional :: thresh, thresh_value
    logical, intent(in), optional :: hermitian
    integer, intent(in), optional :: verbosity
    character(len=*), intent(in), optional :: pname, algorithm, options
    integer(c_int64_t), intent(in), optional :: mpicomm
    integer, intent(out), optional :: range(2)
    double precision :: th, thv
    integer(c_size_t) :: lo, hi
    integer :: verb
    th = 1d-8
    if (present(thresh)) th = thresh
    thv = 1d50
    if (present(thresh_value)) thv = thresh_value
    verb = 0
    if (present(verbosity)) verb = verbosity
    call IterativeSolverLinearEigensystemInitialize( &
         int(n, c_size_t), int(nroot, c_size_t), lo, hi, th, thv, &
         l2i(hermitian, .true.), int(verb, c_int), &
         str_or(pname, '')//c_null_char, comm_or(mpicomm), &
         str_or(algorithm, 'Davidson')//c_null_char, &
         str_or(options, '')//c_null_char)
    active_n = n
    active_nroot = nroot
    call store_range(lo, hi, range)
  end subroutine Iterative_Solver_Linear_Eigensystem_Initialize

  subroutine Iterative_Solver_Linear_Equations_Initialize(n, nroot, rhs, &
      augmented_hessian, thresh, thresh_value, hermitian, verbosity, &
      pname, mpicomm, algorithm, range, options)
    integer, intent(in) :: n, nroot
    double precision, intent(in), contiguous :: rhs(:, :)  ! (n, nroot)
    double precision, intent(in), optional :: augmented_hessian
    double precision, intent(in), optional :: thresh, thresh_value
    logical, intent(in), optional :: hermitian
    integer, intent(in), optional :: verbosity
    character(len=*), intent(in), optional :: pname, algorithm, options
    integer(c_int64_t), intent(in), optional :: mpicomm
    integer, intent(out), optional :: range(2)
    double precision :: th, thv, augh
    integer(c_size_t) :: lo, hi
    integer :: verb
    th = 1d-8
    if (present(thresh)) th = thresh
    thv = 1d50
    if (present(thresh_value)) thv = thresh_value
    augh = 0d0
    if (present(augmented_hessian)) augh = augmented_hessian
    verb = 0
    if (present(verbosity)) verb = verbosity
    call IterativeSolverLinearEquationsInitialize( &
         int(n, c_size_t), int(nroot, c_size_t), lo, hi, rhs, augh, th, &
         thv, l2i(hermitian, .true.), int(verb, c_int), &
         str_or(pname, '')//c_null_char, comm_or(mpicomm), &
         str_or(algorithm, 'Davidson')//c_null_char, &
         str_or(options, '')//c_null_char)
    active_n = n
    active_nroot = nroot
    call store_range(lo, hi, range)
  end subroutine Iterative_Solver_Linear_Equations_Initialize

  subroutine Iterative_Solver_DIIS_Initialize(n, thresh, verbosity, pname, &
      mpicomm, algorithm, range, options)
    integer, intent(in) :: n
    double precision, intent(in), optional :: thresh
    integer, intent(in), optional :: verbosity
    character(len=*), intent(in), optional :: pname, algorithm, options
    integer(c_int64_t), intent(in), optional :: mpicomm
    integer, intent(out), optional :: range(2)
    double precision :: th
    integer(c_size_t) :: lo, hi
    integer :: verb
    th = 1d-8
    if (present(thresh)) th = thresh
    verb = 0
    if (present(verbosity)) verb = verbosity
    call IterativeSolverNonLinearEquationsInitialize( &
         int(n, c_size_t), lo, hi, th, int(verb, c_int), &
         str_or(pname, '')//c_null_char, comm_or(mpicomm), &
         str_or(algorithm, 'DIIS')//c_null_char, &
         str_or(options, '')//c_null_char)
    active_n = n
    active_nroot = 1
    call store_range(lo, hi, range)
  end subroutine Iterative_Solver_DIIS_Initialize

  subroutine Iterative_Solver_Optimize_Initialize(n, thresh, thresh_value, &
      verbosity, minimize, pname, mpicomm, algorithm, range, options)
    integer, intent(in) :: n
    double precision, intent(in), optional :: thresh, thresh_value
    integer, intent(in), optional :: verbosity
    logical, intent(in), optional :: minimize
    character(len=*), intent(in), optional :: pname, algorithm, options
    integer(c_int64_t), intent(in), optional :: mpicomm
    integer, intent(out), optional :: range(2)
    double precision :: th, thv
    integer(c_size_t) :: lo, hi
    integer :: verb
    th = 1d-8
    if (present(thresh)) th = thresh
    thv = 1d50
    if (present(thresh_value)) thv = thresh_value
    verb = 0
    if (present(verbosity)) verb = verbosity
    call IterativeSolverOptimizeInitialize( &
         int(n, c_size_t), lo, hi, th, thv, int(verb, c_int), &
         l2i(minimize, .true.), str_or(pname, '')//c_null_char, &
         comm_or(mpicomm), str_or(algorithm, 'BFGS')//c_null_char, &
         str_or(options, '')//c_null_char)
    active_n = n
    active_nroot = 1
    call store_range(lo, hi, range)
  end subroutine Iterative_Solver_Optimize_Initialize

  subroutine Iterative_Solver_Finalize()
    call IterativeSolverFinalize()
    active_n = 0
    active_nroot = 0
  end subroutine Iterative_Solver_Finalize

  ! ------------------------------------------------------------------
  ! iteration surface
  ! ------------------------------------------------------------------

  !> Add a block of (parameters, action) column vectors; the buffer size
  !> is derived from the array shape. With ``value`` present, delegates
  !> to the scalar-objective AddValue path (optimization).
  integer function Iterative_Solver_Add_Vector(parameters, action, &
      synchronize, value) result(nwork)
    double precision, intent(inout), contiguous :: parameters(:, :)
    double precision, intent(inout), contiguous :: action(:, :)
    logical, intent(in), optional :: synchronize
    double precision, intent(in), optional :: value
    integer(c_int) :: syn
    syn = l2i(synchronize, .true.)
    if (present(value)) then
      nwork = int(IterativeSolverAddValue(value, parameters, action, syn))
    else
      nwork = int(IterativeSolverAddVector( &
          int(size(parameters, 2), c_size_t), parameters, action, syn))
    end if
  end function Iterative_Solver_Add_Vector

  integer function Iterative_Solver_Add_Value(value, parameters, action, &
      synchronize) result(nwork)
    double precision, intent(in) :: value
    double precision, intent(inout), contiguous :: parameters(:)
    double precision, intent(inout), contiguous :: action(:)
    logical, intent(in), optional :: synchronize
    nwork = int(IterativeSolverAddValue(value, parameters, action, &
                                        l2i(synchronize, .true.)))
  end function Iterative_Solver_Add_Value

  integer function Iterative_Solver_End_Iteration(solution, residual, &
      synchronize) result(nwork)
    double precision, intent(inout), contiguous :: solution(:, :)
    double precision, intent(inout), contiguous :: residual(:, :)
    logical, intent(in), optional :: synchronize
    nwork = int(IterativeSolverEndIteration( &
        int(size(solution, 2), c_size_t), solution, residual, &
        l2i(synchronize, .true.)))
  end function Iterative_Solver_End_Iteration

  logical function Iterative_Solver_End_Iteration_Needed() result(needed)
    needed = IterativeSolverEndIterationNeeded() /= 0
  end function Iterative_Solver_End_Iteration_Needed

  !> Reconstruct solutions/residuals for the given 1-based roots.
  subroutine Iterative_Solver_Solution(roots, parameters, action, synchronize)
    integer, intent(in) :: roots(:)
    double precision, intent(inout), contiguous :: parameters(:, :)
    double precision, intent(inout), contiguous :: action(:, :)
    logical, intent(in), optional :: synchronize
    integer(c_int) :: roots_c(size(roots))
    roots_c = int(roots - 1, c_int)
    call IterativeSolverSolution(int(size(roots), c_int), roots_c, &
                                 parameters, action, l2i(synchronize, .true.))
  end subroutine Iterative_Solver_Solution

  !> Install nP sparse P vectors (offsets/indices 0-based CSR-like, as the
  !> C ABI stores them), their (nP, nP) model matrix, and the user's
  !> BIND(C) P-action callback.
  integer function Iterative_Solver_Add_P(nP, offsets, indices, &
      coefficients, pp, parameters, action, fproc, synchronize) result(nwork)
    integer, intent(in) :: nP
    integer(c_size_t), intent(in), contiguous :: offsets(:), indices(:)
    double precision, intent(in), contiguous :: coefficients(:), pp(:, :)
    double precision, intent(inout), contiguous :: parameters(:, :)
    double precision, intent(inout), contiguous :: action(:, :)
    procedure(iterative_solver_apply_on_p) :: fproc
    logical, intent(in), optional :: synchronize
    nwork = int(IterativeSolverAddP( &
        int(size(parameters, 2), c_size_t), int(nP, c_size_t), offsets, &
        indices, coefficients, pp, parameters, action, &
        l2i(synchronize, .true.), c_funloc(fproc)))
  end function Iterative_Solver_Add_P

  !> Suggest up to size(indices) P-space candidates; returns the count and
  !> fills ``indices`` with 1-based positions.
  integer function Iterative_Solver_Suggest_P(solution, residual, indices, &
      threshold) result(count)
    double precision, intent(in), contiguous :: solution(:, :)
    double precision, intent(in), contiguous :: residual(:, :)
    integer, intent(inout) :: indices(:)
    double precision, intent(in), optional :: threshold
    integer(c_size_t) :: idx_c(size(indices))
    double precision :: th
    integer :: i
    th = 0d0
    if (present(threshold)) th = threshold
    idx_c = 0_c_size_t
    count = int(IterativeSolverSuggestP(solution, residual, &
        int(size(indices), c_size_t), th, idx_c))
    do i = 1, count
      indices(i) = int(idx_c(i)) + 1
    end do
  end function Iterative_Solver_Suggest_P

  ! ------------------------------------------------------------------
  ! allocatable-result getters
  ! ------------------------------------------------------------------

  function Iterative_Solver_Errors() result(errors)
    double precision, allocatable :: errors(:)
    allocate(errors(max(active_nroot, 1)))
    errors = 0d0
    call IterativeSolverErrors(errors)
  end function Iterative_Solver_Errors

  function Iterative_Solver_Eigenvalues() result(eigenvalues)
    double precision, allocatable :: eigenvalues(:)
    allocate(eigenvalues(max(active_nroot, 1)))
    eigenvalues = 0d0
    call IterativeSolverEigenvalues(eigenvalues)
  end function Iterative_Solver_Eigenvalues

  function Iterative_Solver_Working_Set_Eigenvalues(working_set_size) &
      result(eigenvalues)
    integer, intent(in) :: working_set_size
    double precision, allocatable :: eigenvalues(:)
    allocate(eigenvalues(max(working_set_size, 1)))
    eigenvalues = 0d0
    call IterativeSolverWorkingSetEigenvalues(eigenvalues)
  end function Iterative_Solver_Working_Set_Eigenvalues

  function Iterative_Solver_Diagonals() result(diagonals)
    double precision, allocatable :: diagonals(:)
    allocate(diagonals(max(active_n, 1)))
    diagonals = 0d0
    call IterativeSolverDiagonals(diagonals)
  end function Iterative_Solver_Diagonals

  subroutine Iterative_Solver_Set_Diagonals(diagonals)
    double precision, intent(in), contiguous :: diagonals(:)
    call IterativeSolverSetDiagonals(diagonals)
  end subroutine Iterative_Solver_Set_Diagonals

  ! ------------------------------------------------------------------
  ! scalar queries
  ! ------------------------------------------------------------------

  double precision function Iterative_Solver_Value() result(v)
    v = IterativeSolverValue()
  end function Iterative_Solver_Value

  logical function Iterative_Solver_Has_Values() result(v)
    v = IterativeSolverHasValues() /= 0
  end function Iterative_Solver_Has_Values

  logical function Iterative_Solver_Has_Eigenvalues() result(v)
    v = IterativeSolverHasEigenvalues() /= 0
  end function Iterative_Solver_Has_Eigenvalues

  logical function Iterative_Solver_Non_Linear() result(v)
    v = IterativeSolverNonLinear() /= 0
  end function Iterative_Solver_Non_Linear

  integer function Iterative_Solver_Verbosity() result(v)
    v = int(IterativeSolverVerbosity())
  end function Iterative_Solver_Verbosity

  integer function Iterative_Solver_Max_Iter() result(v)
    v = int(IterativeSolverMaxIter())
  end function Iterative_Solver_Max_Iter

  subroutine Iterative_Solver_Set_Max_Iter(max_iter)
    integer, intent(in) :: max_iter
    call IterativeSolverSetMaxIter(int(max_iter, c_int))
  end subroutine Iterative_Solver_Set_Max_Iter

  subroutine Iterative_Solver_Print_Statistics()
    call IterativeSolverPrintStatistics()
  end subroutine Iterative_Solver_Print_Statistics

  ! ------------------------------------------------------------------
  ! communicators (accepted for source compatibility; single-process)
  ! ------------------------------------------------------------------

  integer(c_int64_t) function comm_or(mpicomm) result(comm)
    integer(c_int64_t), intent(in), optional :: mpicomm
    if (present(mpicomm)) then
      comm = mpicomm
    else
      comm = mpicomm_compute()
    end if
  end function comm_or

  integer(c_int64_t) function mpicomm_compute() result(comm)
    if (compute_comm >= 0_c_int64_t) then
      comm = compute_comm
    else
      comm = IterativeSolver_mpicomm_global()
    end if
  end function mpicomm_compute

  subroutine set_mpicomm_compute(comm)
    integer(c_int64_t), intent(in) :: comm
    compute_comm = comm
  end subroutine set_mpicomm_compute

  integer(c_int64_t) function mpicomm_global_f() result(comm)
    comm = IterativeSolver_mpicomm_global()
  end function mpicomm_global_f

  integer(c_int64_t) function mpicomm_self_f() result(comm)
    comm = IterativeSolver_mpicomm_self()
  end function mpicomm_self_f

  ! ------------------------------------------------------------------
  ! one-call Solve driver on the ACTIVE instance
  ! ------------------------------------------------------------------

  !> Drive the ACTIVE solver (set up by one of the initializers above) to
  !> convergence with the user's problem_t callbacks: the Fortran twin of
  !> the reference's Iterative_Solver_Solve (IterativeSolverF.F90:814) —
  !> unlike problem_solve (iterative_solver_problem_f.F90), which creates
  !> and finalizes its own instance, this operates on whatever instance is
  !> live, so callers can pre-set diagonals, max_iter, or P space first.
  !> Branches on the instance kind: scalar-objective (AddValue), nonlinear
  !> residual (DIIS), or linear action (Davidson families).
  logical function Iterative_Solver_Solve(parameters, actions, prob, &
      generate_initial_guess, max_iter) result(converged)
    double precision, intent(inout), contiguous :: parameters(:, :)
    double precision, intent(inout), contiguous :: actions(:, :)
    class(problem_t), intent(in) :: prob
    logical, intent(in), optional :: generate_initial_guess
    integer, intent(in), optional :: max_iter
    integer :: n, iters, iter, verb, i, j, pick
    integer(c_size_t) :: nwork
    logical :: have_diag, is_value, is_nonlin
    double precision :: f
    double precision, allocatable :: diag(:), shifts(:), errors(:)
    logical, allocatable :: taken(:)

    n = size(parameters, 1)
    iters = Iterative_Solver_Max_Iter()
    if (present(max_iter)) then
      iters = max_iter
      call Iterative_Solver_Set_Max_Iter(max_iter)
    end if
    verb = Iterative_Solver_Verbosity()
    is_value = Iterative_Solver_Has_Values()
    is_nonlin = Iterative_Solver_Non_Linear()

    allocate(diag(n), shifts(max(active_nroot, 1)), &
             errors(max(active_nroot, 1)))
    have_diag = prob%diagonals(diag)
    if (have_diag) call Iterative_Solver_Set_Diagonals(diag)

    if (present(generate_initial_guess)) then
      if (generate_initial_guess .and. have_diag) then
        ! unit vectors on the active_nroot smallest diagonal entries
        allocate(taken(n))
        taken = .false.
        parameters = 0d0
        do j = 1, min(active_nroot, size(parameters, 2))
          pick = 0
          do i = 1, n
            if (.not. taken(i)) then
              if (pick == 0) then
                pick = i
              else if (diag(i) < diag(pick)) then
                pick = i
              end if
            end if
          end do
          taken(pick) = .true.
          parameters(pick, j) = 1d0
        end do
        deallocate(taken)
      end if
    end if

    converged = .false.
    nwork = int(min(active_nroot, size(parameters, 2)), c_size_t)
    do iter = 1, iters
      if (is_value) then
        f = prob%residual(parameters(:, 1), actions(:, 1))
        nwork = IterativeSolverAddValue(f, parameters(:, 1), &
                                        actions(:, 1), 1_c_int)
      else if (is_nonlin) then
        f = prob%residual(parameters(:, 1), actions(:, 1))
        nwork = IterativeSolverAddVector(1_c_size_t, parameters, &
                                         actions, 1_c_int)
      else
        call prob%action(parameters(:, 1:int(nwork)), &
                         actions(:, 1:int(nwork)))
        nwork = IterativeSolverAddVector(nwork, parameters, actions, 1_c_int)
      end if
      do while (Iterative_Solver_End_Iteration_Needed())
        if (nwork > 0) then
          shifts = 0d0
          if (Iterative_Solver_Has_Eigenvalues()) &
            call IterativeSolverWorkingSetEigenvalues(shifts)
          if (have_diag) then
            call prob%precondition(actions(:, 1:max(int(nwork), 1)), &
                                   shifts(1:max(int(nwork), 1)), diag)
          else
            call prob%precondition(actions(:, 1:max(int(nwork), 1)), &
                                   shifts(1:max(int(nwork), 1)))
          end if
        end if
        nwork = IterativeSolverEndIteration( &
            int(size(parameters, 2), c_size_t), parameters, actions, 1_c_int)
      end do
      errors = Iterative_Solver_Errors()
      call prob%report(iter, verb, errors)
      if (nwork == 0) then
        converged = .true.
        exit
      end if
    end do
    deallocate(diag, shifts, errors)
  end function Iterative_Solver_Solve

end module iterative_solver_driver
