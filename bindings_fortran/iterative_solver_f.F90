!> Fortran interface to the iterative_solver_tpu embedded C library.
!>
!> Mirrors the reference's Iterative_Solver module (IterativeSolverF.F90) as
!> thin BIND(C) interfaces to the C ABI in include/iterative_solver_c.h.
!> Link against libiterative_solver_tpu_c.so (built by
!> `python -m iterative_solver_tpu.bindings.build_embedded`).
!> NOTE: shipped as source; this build image has no Fortran compiler, so the
!> module is validated only against the C ABI it declares.
module iterative_solver
  use iso_c_binding
  implicit none

  interface
    subroutine IterativeSolverLinearEigensystemInitialize(n, nroot, range_begin, range_end, &
        thresh, thresh_value, hermitian, verbosity, fname, fcomm, algorithm, options) &
        bind(C, name='IterativeSolverLinearEigensystemInitialize')
      use iso_c_binding
      integer(c_size_t), value :: n, nroot
      integer(c_size_t) :: range_begin, range_end
      real(c_double), value :: thresh, thresh_value
      integer(c_int), value :: hermitian, verbosity
      character(c_char) :: fname(*), algorithm(*), options(*)
      integer(c_int64_t), value :: fcomm
    end subroutine

    subroutine IterativeSolverLinearEquationsInitialize(n, nroot, range_begin, range_end, rhs, &
        aughes, thresh, thresh_value, hermitian, verbosity, fname, fcomm, algorithm, options) &
        bind(C, name='IterativeSolverLinearEquationsInitialize')
      use iso_c_binding
      integer(c_size_t), value :: n, nroot
      integer(c_size_t) :: range_begin, range_end
      real(c_double) :: rhs(*)
      real(c_double), value :: aughes, thresh, thresh_value
      integer(c_int), value :: hermitian, verbosity
      character(c_char) :: fname(*), algorithm(*), options(*)
      integer(c_int64_t), value :: fcomm
    end subroutine

    subroutine IterativeSolverNonLinearEquationsInitialize(n, range_begin, range_end, thresh, &
        verbosity, fname, fcomm, algorithm, options) &
        bind(C, name='IterativeSolverNonLinearEquationsInitialize')
      use iso_c_binding
      integer(c_size_t), value :: n
      integer(c_size_t) :: range_begin, range_end
      real(c_double), value :: thresh
      integer(c_int), value :: verbosity
      character(c_char) :: fname(*), algorithm(*), options(*)
      integer(c_int64_t), value :: fcomm
    end subroutine

    subroutine IterativeSolverOptimizeInitialize(n, range_begin, range_end, thresh, thresh_value, &
        verbosity, minimize, fname, fcomm, algorithm, options) &
        bind(C, name='IterativeSolverOptimizeInitialize')
      use iso_c_binding
      integer(c_size_t), value :: n
      integer(c_size_t) :: range_begin, range_end
      real(c_double), value :: thresh, thresh_value
      integer(c_int), value :: verbosity, minimize
      character(c_char) :: fname(*), algorithm(*), options(*)
      integer(c_int64_t), value :: fcomm
    end subroutine

    subroutine IterativeSolverFinalize() bind(C, name='IterativeSolverFinalize')
    end subroutine

    function IterativeSolverAddVector(buffer_size, parameters, action, sync) result(nwork) &
        bind(C, name='IterativeSolverAddVector')
      use iso_c_binding
      integer(c_size_t), value :: buffer_size
      real(c_double) :: parameters(*), action(*)
      integer(c_int), value :: sync
      integer(c_size_t) :: nwork
    end function

    function IterativeSolverAddValue(value, parameters, action, sync) result(nwork) &
        bind(C, name='IterativeSolverAddValue')
      use iso_c_binding
      real(c_double), value :: value
      real(c_double) :: parameters(*), action(*)
      integer(c_int), value :: sync
      integer(c_size_t) :: nwork
    end function

    function IterativeSolverEndIteration(buffer_size, solution, residual, sync) result(nwork) &
        bind(C, name='IterativeSolverEndIteration')
      use iso_c_binding
      integer(c_size_t), value :: buffer_size
      real(c_double) :: solution(*), residual(*)
      integer(c_int), value :: sync
      integer(c_size_t) :: nwork
    end function

    function IterativeSolverEndIterationNeeded() result(needed) &
        bind(C, name='IterativeSolverEndIterationNeeded')
      use iso_c_binding
      integer(c_int) :: needed
    end function

    subroutine IterativeSolverSolution(nroot, roots, parameters, action, sync) &
        bind(C, name='IterativeSolverSolution')
      use iso_c_binding
      integer(c_int), value :: nroot
      integer(c_int) :: roots(*)
      real(c_double) :: parameters(*), action(*)
      integer(c_int), value :: sync
    end subroutine

    !> Suggest P-space indices (0-based) from the current solution and
    !> residual blocks; returns the count written into ``indices``
    !> (IterativeSolverC.h:47-48 — here backed by the real top-k
    !> |solution_i * residual_i| selection, not the reference's {} stub).
    function IterativeSolverSuggestP(solution, residual, maximum_number, &
        threshold, indices) result(np_found) &
        bind(C, name='IterativeSolverSuggestP')
      use iso_c_binding
      real(c_double) :: solution(*), residual(*)
      integer(c_size_t), value :: maximum_number
      real(c_double), value :: threshold
      integer(c_size_t) :: indices(*)
      integer(c_size_t) :: np_found
    end function

    subroutine IterativeSolverErrors(errors) bind(C, name='IterativeSolverErrors')
      use iso_c_binding
      real(c_double) :: errors(*)
    end subroutine

    subroutine IterativeSolverEigenvalues(eigenvalues) bind(C, name='IterativeSolverEigenvalues')
      use iso_c_binding
      real(c_double) :: eigenvalues(*)
    end subroutine

    subroutine IterativeSolverWorkingSetEigenvalues(eigenvalues) &
        bind(C, name='IterativeSolverWorkingSetEigenvalues')
      use iso_c_binding
      real(c_double) :: eigenvalues(*)
    end subroutine

    subroutine IterativeSolverSetDiagonals(diagonals) bind(C, name='IterativeSolverSetDiagonals')
      use iso_c_binding
      real(c_double) :: diagonals(*)
    end subroutine

    subroutine IterativeSolverDiagonals(diagonals) bind(C, name='IterativeSolverDiagonals')
      use iso_c_binding
      real(c_double) :: diagonals(*)
    end subroutine

    function IterativeSolverValue() result(v) bind(C, name='IterativeSolverValue')
      use iso_c_binding
      real(c_double) :: v
    end function

    function IterativeSolverNonLinear() result(v) bind(C, name='IterativeSolverNonLinear')
      use iso_c_binding
      integer(c_int) :: v
    end function

    function IterativeSolverMaxIter() result(v) bind(C, name='IterativeSolverMaxIter')
      use iso_c_binding
      integer(c_int) :: v
    end function

    subroutine IterativeSolverSetMaxIter(max_iter) bind(C, name='IterativeSolverSetMaxIter')
      use iso_c_binding
      integer(c_int), value :: max_iter
    end subroutine

    subroutine IterativeSolverPrintStatistics() bind(C, name='IterativeSolverPrintStatistics')
    end subroutine

    !> P-space registration (IterativeSolverC.h AddP + apply_on_p trampoline,
    !> IterativeSolverCMPI.cpp:140-160): nP sparse vectors in CSR-like form
    !> (offsets/indices/coefficients), their model hamiltonian pp (nP, nP),
    !> and a BIND(C) callback adding the P-projection action — obtain the
    !> c_funptr with c_funloc(your_subroutine).
    function IterativeSolverAddP(buffer_size, nP, offsets, indices, coefficients, &
        pp, parameters, action, sync, func) result(nwork) &
        bind(C, name='IterativeSolverAddP')
      use iso_c_binding
      integer(c_size_t), value :: buffer_size, nP
      integer(c_size_t) :: offsets(*), indices(*)
      real(c_double) :: coefficients(*), pp(*)
      real(c_double) :: parameters(*), action(*)
      integer(c_int), value :: sync
      type(c_funptr), value :: func
      integer(c_size_t) :: nwork
    end function

    function IterativeSolverHasValues() result(v) bind(C, name='IterativeSolverHasValues')
      use iso_c_binding
      integer(c_int) :: v
    end function

    function IterativeSolverHasEigenvalues() result(v) &
        bind(C, name='IterativeSolverHasEigenvalues')
      use iso_c_binding
      integer(c_int) :: v
    end function

    function IterativeSolverVerbosity() result(v) bind(C, name='IterativeSolverVerbosity')
      use iso_c_binding
      integer(c_int) :: v
    end function

    function IterativeSolver_mpicomm_global() result(v) &
        bind(C, name='IterativeSolver_mpicomm_global')
      use iso_c_binding
      integer(c_int64_t) :: v
    end function

    function IterativeSolver_mpicomm_self() result(v) &
        bind(C, name='IterativeSolver_mpicomm_self')
      use iso_c_binding
      integer(c_int64_t) :: v
    end function
  end interface

  !> Signature for the IterativeSolverAddP callback: pcoeff is
  !> (update_size, nP) row-major, act receives += contributions, ranges
  !> holds [lo, hi) per vector (full range in this single-process build).
  abstract interface
    subroutine iterative_solver_apply_on_p(pcoeff, act, update_size, ranges) bind(C)
      use iso_c_binding
      real(c_double), intent(in) :: pcoeff(*)
      real(c_double), intent(inout) :: act(*)
      integer(c_size_t), value :: update_size
      integer(c_size_t), intent(in) :: ranges(*)
    end subroutine
  end interface
end module iterative_solver
