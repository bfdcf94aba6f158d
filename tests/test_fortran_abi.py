"""Fortran↔C ABI conformance (VERDICT r1 #9).

No Fortran compiler ships in this image, so the F90 module
(`bindings_fortran/iterative_solver_f.F90`) can't be compiled against the
embedded library.  This test reduces that gap to pure syntax: it parses
every ``bind(C, name=...)`` interface out of the F90 source and checks each
against the C prototypes in ``include/iterative_solver_c.h`` — symbol
exists, arity matches, and every argument agrees position-by-position on
(base C type, by-value vs pointer).  It also checks that every header
prototype has a ``@ffi.def_extern`` implementation in
``bindings/build_embedded.py``, i.e. would actually be exported by the .so
(cffi errors at build time on any def_extern name missing from its cdef,
so header ⊆ def_extern ⊆ cdef closes the chain).

Reference twin: the 1054-LoC IterativeSolverF.F90 is exercised by gtest
twins (test/itsolv/CMakeLists.txt:24-28); this is the compiler-free
equivalent of the link step.
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
F90 = os.path.join(REPO, "bindings_fortran", "iterative_solver_f.F90")
HEADER = os.path.join(REPO, "include", "iterative_solver_c.h")
EMBEDDED = os.path.join(REPO, "iterative_solver_tpu", "bindings", "build_embedded.py")

F2C_TYPE = {
    "c_size_t": "size_t",
    "c_double": "double",
    "c_int": "int",
    "c_int64_t": "int64_t",
    "c_char": "char",
    "c_funptr": "funptr",
}


def _join_continuations(text):
    """Fortran free-form: trailing '&' joins with the next line (which may
    itself start with '&')."""
    out, buf = [], ""
    for line in text.splitlines():
        line = line.split("!")[0].rstrip() if not line.lstrip().startswith("!>") else ""
        s = line.strip()
        if not s:
            continue
        if s.startswith("&"):
            s = s[1:].lstrip()
        if s.endswith("&"):
            buf += s[:-1] + " "
        else:
            out.append(buf + s)
            buf = ""
    if buf:
        out.append(buf)
    return out


def parse_f90_interfaces(path):
    """{c_name: {"args": [(ctype, byval)], "ret": ctype|"void"}} for every
    explicit bind(C, name='...') interface (the abstract callback interface
    has no name= and is excluded — it is the USER's symbol, not the .so's)."""
    with open(path) as fh:
        lines = _join_continuations(fh.read())
    sigs = {}
    i = 0
    head_re = re.compile(
        r"^(subroutine|function)\s+(\w+)\s*\(([^)]*)\)\s*"
        r"(?:result\((\w+)\))?\s*bind\(C,\s*name='(\w+)'\)", re.IGNORECASE)
    decl_re = re.compile(
        r"^(integer|real|character|type)\s*\(\s*(\w+)\s*\)\s*"
        r"((?:,\s*\w+(?:\([^)]*\))?)*)\s*::\s*(.+)$", re.IGNORECASE)
    while i < len(lines):
        m = head_re.match(lines[i])
        if not m:
            i += 1
            continue
        kind, _fname, argstr, result_var, cname = m.groups()
        argnames = [a.strip().lower() for a in argstr.split(",") if a.strip()]
        decls = {}
        i += 1
        while i < len(lines) and not re.match(
                r"^end\s+(subroutine|function)", lines[i], re.IGNORECASE):
            dm = decl_re.match(lines[i])
            if dm:
                _base, kindname, attrs, varlist = dm.groups()
                byval = "value" in attrs.lower()
                ctype = F2C_TYPE[kindname.lower()]
                for var in varlist.split(","):
                    var = var.strip()
                    array = var.endswith("(*)")
                    name = var.split("(")[0].strip().lower()
                    # arrays and non-value scalars both pass by reference
                    decls[name] = (ctype, byval and not array)
            i += 1
        args = []
        for a in argnames:
            assert a in decls, f"{cname}: argument '{a}' has no declaration"
            args.append(decls[a])
        if kind.lower() == "function":
            rv = result_var.lower() if result_var else _fname.lower()
            assert rv in decls, f"{cname}: result '{rv}' has no declaration"
            ret = decls[rv][0]
        else:
            ret = "void"
        sigs[cname] = {"args": args, "ret": ret}
        i += 1
    return sigs


def _split_top_level(s):
    """Split on commas not inside parentheses (function-pointer params)."""
    parts, depth, cur = [], 0, ""
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    return [p.strip() for p in parts]


def _classify_c_param(p):
    p = p.replace("const", " ").strip()
    if "(*" in p:  # function pointer, passed by value like c_funptr
        return ("funptr", True)
    ptr = "*" in p
    base = p.replace("*", " ").split()[0]
    return (base, not ptr)


def parse_c_header(path):
    with open(path) as fh:
        text = fh.read()
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.DOTALL)
    text = re.sub(r"//[^\n]*", " ", text)
    text = " ".join(text.split())
    sigs = {}
    for m in re.finditer(r"(\w[\w\s]*?[\w\*])\s+(IterativeSolver\w*)\s*\(([^;]*)\)\s*;", text):
        ret, name, params = m.groups()
        params = params.strip()
        if params in ("", "void"):
            args = []
        else:
            args = [_classify_c_param(p) for p in _split_top_level(params)]
        sigs[name] = {"args": args, "ret": ret.strip()}
    return sigs


def test_every_fortran_interface_matches_the_header():
    f90 = parse_f90_interfaces(F90)
    hdr = parse_c_header(HEADER)
    assert len(f90) >= 20, f"parser found only {len(f90)} interfaces"
    missing = sorted(set(f90) - set(hdr))
    assert not missing, f"F90 declares symbols absent from the C header: {missing}"
    for name, sig in f90.items():
        href = hdr[name]
        assert len(sig["args"]) == len(href["args"]), (
            f"{name}: arity {len(sig['args'])} (F90) vs {len(href['args'])} (C)")
        for k, (fa, ha) in enumerate(zip(sig["args"], href["args"])):
            assert fa == ha, (
                f"{name} arg {k}: F90 {fa} vs C {ha} "
                f"(type, by-value) must agree position-by-position")
        assert sig["ret"] == href["ret"], (
            f"{name}: return {sig['ret']} (F90) vs {href['ret']} (C)")


def test_every_header_symbol_is_implemented_in_the_embedded_library():
    hdr = parse_c_header(HEADER)
    with open(EMBEDDED) as fh:
        src = fh.read()
    implemented = set(
        re.findall(r"@ffi\.def_extern\(\)\s*\ndef\s+(\w+)\s*\(", src))
    missing = sorted(set(hdr) - implemented)
    assert not missing, (
        f"C header declares symbols with no @ffi.def_extern implementation "
        f"in build_embedded.py (the .so would not export them): {missing}")


def test_problem_module_calls_only_declared_interfaces():
    # the Fortran Problem/Solve driver may only call C-bound names that the
    # interface module actually declares
    f90 = parse_f90_interfaces(F90)
    with open(os.path.join(REPO, "bindings_fortran",
                           "iterative_solver_problem_f.F90")) as fh:
        src = fh.read()
    called = set(re.findall(r"\b(IterativeSolver\w*)\s*\(", src))
    undeclared = sorted(called - set(f90))
    assert not undeclared, (
        f"problem module calls interfaces not declared in "
        f"iterative_solver_f.F90: {undeclared}")


DRIVER = os.path.join(REPO, "bindings_fortran", "iterative_solver_driver_f.F90")


def test_driver_module_calls_only_declared_interfaces():
    """The convenience layer (VERDICT r3 missing #2) may only call C-bound
    names the raw interface module declares — the compiler-free link check."""
    f90 = parse_f90_interfaces(F90)
    with open(DRIVER) as fh:
        src = fh.read()
    called = set(re.findall(r"\b(IterativeSolver\w*)\s*\(", src))
    undeclared = sorted(called - set(f90))
    assert not undeclared, (
        f"driver module calls interfaces not declared in "
        f"iterative_solver_f.F90: {undeclared}")


def test_driver_module_public_surface():
    """Reference-wrapper parity: every convenience procedure the reference
    module exposes Fortran-side logic for (IterativeSolverF.F90:78-1046)
    has a counterpart, both declared public and actually defined."""
    required = [
        "Iterative_Solver_Linear_Eigensystem_Initialize",
        "Iterative_Solver_Linear_Equations_Initialize",
        "Iterative_Solver_DIIS_Initialize",
        "Iterative_Solver_Optimize_Initialize",
        "Iterative_Solver_Finalize",
        "Iterative_Solver_Solve",
        "Iterative_Solver_Add_Vector",
        "Iterative_Solver_Add_Value",
        "Iterative_Solver_End_Iteration",
        "Iterative_Solver_End_Iteration_Needed",
        "Iterative_Solver_Solution",
        "Iterative_Solver_Add_P",
        "Iterative_Solver_Suggest_P",
        "Iterative_Solver_Errors",
        "Iterative_Solver_Eigenvalues",
        "Iterative_Solver_Working_Set_Eigenvalues",
        "Iterative_Solver_Value",
        "Iterative_Solver_Set_Diagonals",
        "Iterative_Solver_Diagonals",
        "Iterative_Solver_Print_Statistics",
        "mpicomm_compute",
        "set_mpicomm_compute",
    ]
    with open(DRIVER) as fh:
        src = fh.read()
    low = src.lower()
    for name in required:
        assert re.search(rf"public\s*::.*\b{name.lower()}\b", low), (
            f"{name} not declared public in the driver module")
        assert re.search(
            rf"(subroutine|function)\s+{name.lower()}\s*\(", low) or re.search(
            rf"function\s+{name.lower()}\s*\(", low), (
            f"{name} has no definition in the driver module")


def test_driver_module_constructs_balanced():
    """Crude compile-free syntax sanity: every subroutine/function opened in
    the driver module is closed, and module/contains appear once."""
    with open(DRIVER) as fh:
        lines = _join_continuations(fh.read())
    opens = 0
    closes = 0
    for s in lines:
        sl = s.lower()
        if re.match(r"^end\s+(subroutine|function)\b", sl):
            closes += 1
        elif re.match(
                r"^(pure\s+|logical\s+|integer(\(\w+\))?\s+|double\s+precision\s+"
                r"|real(\(\w+\))?\s+)*(subroutine|function)\s+\w+\s*\(", sl):
            opens += 1
    assert opens == closes and opens >= 25, (
        f"unbalanced constructs: {opens} opens vs {closes} closes")
    assert sum(1 for s in lines if s.lower().startswith("module ")) == 1
    assert sum(1 for s in lines if s.lower() == "contains") == 1
